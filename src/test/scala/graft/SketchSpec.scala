package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventOps

/** The mergeable-sketch contracts behind q_hll_rollup: union is
  * register-wise max, so HOW the stream was pre-partitioned into sketches
  * cannot change the merged answer — the property that makes a stored
  * sketch pre-aggregate trustworthy at any append depth. */
class SketchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("sketch rollup is grouping-invariant: hourly-union == minutely-union bit-for-bit") {
    val ev = graft.sources.Tables.events(s, TestSpark.sfDir)
    def merged(bucket: org.apache.spark.sql.Column): Seq[(java.sql.Timestamp, Long)] =
      ev.groupBy(date_trunc("DAY", col("ts")).as("day"), bucket.as("b"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
        .orderBy("day")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    val hourly = merged(date_trunc("HOUR", col("ts")))
    val minutely = merged(date_trunc("MINUTE", col("ts")))
    assert(hourly.nonEmpty)
    assert(hourly === minutely,
      "merging per-hour sketches and per-minute sketches must estimate identically")
  }

  test("q_hll_rollup: every day within the 5% bound, exact side exact") {
    val rows = EventOps.qHllRollup(s, TestSpark.sfDir).collect()
    assert(rows.length > 1, "the rollup must cover multiple days")
    assert(rows.forall(_.getBoolean(2)), "a sketch drifted past the configured bound")
    val exact = graft.sources.Tables.events(s, TestSpark.sfDir)
      .groupBy(date_trunc("DAY", col("ts")).as("d"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    rows.foreach(r => assert(exact(r.getTimestamp(0)) === r.getLong(1)))
  }
}
