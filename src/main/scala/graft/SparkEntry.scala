package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.operators.{BloomJoin, CoreOps, Dedup, EventOps, Graph, Multimodal, Pipeline, Search, Similarity, SkewJoin, TemporalJoins, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of every operator registry in graft.operators;
  * `oracleSql` carries the DuckDB-dialect twin for each SQL-expressible
  * query (same column names — the driver's compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query (SURVEY §7.4): the Spark rendition of the reference's
    * richest query, func_get_loader_file_name (body:1163-1251) —
    * scan → ${DAY}-template projection → ci-filter → 3-branch UNION ALL →
    * seq-ordered string aggregation. Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    CoreOps.qUnionStragg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 + the
    * training-data-pipeline extensions (dedup, similarity, text analysis,
    * multimodal, event ops).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreOps.queries ++ TextOps.queries ++ Dedup.queries ++
      Similarity.queries ++ EventOps.queries ++ Multimodal.queries ++
      TemporalJoins.queries ++ Pipeline.queries ++ Search.queries ++
      Graph.queries ++ SkewJoin.queries ++ BloomJoin.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Keys omitted HERE are covered by the
    * dataset-derived differential oracles below — [[oracleSqlFor]] is the
    * full map Verify dumps. */
  def oracleSql: Map[String, String] =
    CoreOps.oracles ++ TextOps.oracles ++ Dedup.oracles ++
      Similarity.oracles ++ EventOps.oracles ++ Multimodal.oracles ++
      TemporalJoins.oracles ++ Pipeline.oracles ++ Search.oracles ++
      Graph.oracles ++ SkewJoin.oracles ++ BloomJoin.oracles

  /** The COMPLETE oracle map for a dataset: the static SQL-replay oracles
    * plus the differential expected-parquet oracles (one per Expected.writeAll key)
    * ([[graft.verify.Expected]] writes the expected files under
    * `expectedDir` and returns `read_parquet` SQL for them). Every key in
    * [[queries]] has an entry (CoreOpsSpec pins the invariant). */
  def oracleSqlFor(spark: SparkSession, sfDir: String, expectedDir: String): Map[String, String] =
    oracleSql ++ graft.verify.Expected.writeAll(spark, sfDir, expectedDir)
}
