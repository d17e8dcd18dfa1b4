package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** THE stored-search-index probe pipeline (hits + additive `_stats`
  * roll-up + scorer), shared by every spec that compares a stored index
  * against the in-query BM25 — five drifting copies of the avgdl
  * derivation would let one spec silently check an old stats contract. */
object SearchProbe {
  def scores(spark: SparkSession, path: String): Seq[(Long, Double, Long)] = {
    val hits = graft.operators.Search.probeSearchIndex(spark, path,
        graft.operators.Search.QueryTerms)
      .select("doc_id", "dl", "word", "tf")
    // stats come from the ONE shared definition (incl. the retraction
    // correction) so the probe helper can never drift from the store
    graft.operators.Search.scoreBm25(hits,
        graft.operators.Search.searchStats(spark, path)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
  }
}
