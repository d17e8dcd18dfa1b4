package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Pipeline}
import graft.sources.Tables

/** The capstone pipeline's STAGE ORDER contract (r18 verdict item 3):
  * the expensive near-dup fingerprint+cluster pass consumes the gated,
  * exact-deduped survivors — never the raw corpus. The DuckDB oracle
  * pins the output values; these pin the input-size economics that
  * matter at 100 TB. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("near-dup stage input is the gated survivor frame, strictly smaller than the raw corpus") {
    val raw = Tables.documents(spark, TestSpark.sfDir).count()
    val survivors = Pipeline.gatedSurvivors(spark, TestSpark.sfDir)
    val nSurv = survivors.count()
    assert(nSurv > 0, "the gate must keep something at sf0.001")
    assert(nSurv < raw,
      s"the quality gate + exact dedup must shrink the corpus ($nSurv !< $raw) — " +
        "if they don't, the cheap-gates-first reorder buys nothing")
    // the fingerprint pass over survivors must produce a drop set that
    // only ever names survivors (a raw-corpus doc id here would mean
    // the stage read the wrong frame)
    val pairs = Dedup.ngramPairsOf(survivors.select("doc_id", "text"))
    val labels = Dedup.clusterPairs(pairs.select("doc_a", "doc_b"))
    val dropIds = labels.filter(org.apache.spark.sql.functions.col("node") =!=
        org.apache.spark.sql.functions.col("label"))
      .select(org.apache.spark.sql.functions.col("node").as("doc_id"))
    val strays = dropIds.join(survivors.select("doc_id"), Seq("doc_id"), "left_anti").count()
    assert(strays === 0L, "every near-dup drop id must be a gated survivor")
    // and the composed query still produces per-language rows
    assert(Pipeline.qPipelineE2e(spark, TestSpark.sfDir).count() > 0)
  }
}
