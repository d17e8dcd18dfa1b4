package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Analyze

/** The generic ANALYZE entry point on planted frames with hand-countable
  * stats (the orders-table behavior is hash-verified against DuckDB by the
  * driver gate through q_column_stats / q_histogram, which delegate here).
  */
class AnalyzeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val planted = Seq(
    (1L, Some("a"), Some(10.0)),
    (2L, Some("b"), Some(20.0)),
    (3L, Some("b"), None),
    (4L, None, Some(40.0))
  ).toDF("id", "tag", "score")

  test("columnStats: ndv counts distinct non-nulls, null_frac is exact, min/max stringify") {
    val got = Analyze.columnStats(planted, Seq("id", "tag", "score")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getString(5))).toSeq
    assert(got === Seq(
      ("id", 4L, 4L, 0.0, "1", "4"),
      ("score", 4L, 3L, 0.25, "10.0", "40.0"),
      ("tag", 4L, 2L, 0.25, "a", "b")))
  }

  test("histogram: bins partition [min,max], counts cover every non-null row, nulls excluded") {
    val got = Analyze.histogram(planted, "score", bins = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    // span [10,40] width 10 per bin; 20.0 → bin 1, 40.0 → capped into bin 2
    assert(got === Seq((0L, 1L, 10.0, 10.0), (1L, 1L, 20.0, 20.0), (2L, 1L, 40.0, 40.0)))
    assert(got.map(_._2).sum === 3L, "every non-null row lands in exactly one bin")
  }

  test("histogram: exact-max row is capped into the last bin, not a phantom bin N") {
    val ids = spark.range(0, 100).toDF("v")
    val got = Analyze.histogram(ids, "v", bins = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // width 9.9: v=99 computes raw bin 10 and must cap at 9
    assert(got.map(_._1) === (0L to 9L))
    assert(got.map(_._2).sum === 100L)
    assert(got.forall { case (_, n) => n == 10L || n == 11L || n == 9L })
  }

  test("histogram: a constant column degenerates to one bin 0 (no NaN under ANSI)") {
    val const = Seq(5.0, 5.0, 5.0).toDF("v")
    val got = Analyze.histogram(const, "v", bins = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got === Seq((0L, 3L, 5.0, 5.0)))
  }

  test("histogram: a column literally named lo/hi does not collide with the span aliases") {
    val named = Seq(1.0, 2.0, 3.0).toDF("lo")
    assert(Analyze.histogram(named, "lo", bins = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((0L, 1L), (1L, 2L)))
  }

  test("analyzeTable returns the same pair as the standalone faces") {
    val (stats, hist) = Analyze.analyzeTable(planted, Seq("id", "score"), "score", bins = 3)
    assert(stats.collect().toSeq ===
      Analyze.columnStats(planted, Seq("id", "score")).collect().toSeq)
    assert(hist.collect().toSeq ===
      Analyze.histogram(planted, "score", bins = 3).collect().toSeq)
  }

  test("corrMatrix: exact closed forms on a hand-computable frame, pairwise NULL exclusion") {
    // y = 2x (perfect positive), z = -x (perfect negative); the NULL-y
    // row must drop from (x,y) pairs but stay in (x,z) pairs
    val df = Seq(
      (1.0, Some(2.0), -1.0),
      (2.0, Some(4.0), -2.0),
      (3.0, Some(6.0), -3.0),
      (4.0, None, -4.0)
    ).toDF("x", "y", "z")
    val got = Analyze.corrMatrix(df, Seq("x", "y", "z")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    // covar_samp(x,y) over {1,2,3}×{2,4,6} = 2; covar_samp(x,z) over 4 rows
    // = -var_samp(x) = -(5/3) ≈ -1.666667; covar_samp(y,z) over 3 rows = -2
    assert(got.toSeq === Seq(
      ("x", "y", 3L, 1.0, 2.0),
      ("x", "z", 4L, -1.0, -1.666667),
      ("y", "z", 3L, -1.0, -2.0)))
  }

  test("corrMatrix: a zero-overlap pair reports NULL stats (the SQL semantics), not NaN") {
    // x and y never co-occur: n = 0 and the oracle's NULL-sum arithmetic
    // yields NULL — the engine must agree or the differential gate breaks
    val df = Seq(
      (Some(1.0), Option.empty[Double]),
      (Option.empty[Double], Some(2.0))
    ).toDF("x", "y")
    val got = Analyze.corrMatrix(df, Seq("x", "y")).collect()(0)
    assert(got.getLong(2) === 0L)
    assert(got.isNullAt(3) && got.isNullAt(4))
  }

  test("corrMatrix matches corr()/covar_samp() to float tolerance on real data") {
    // the built-ins are partition-order-dependent in their low bits (why
    // corrMatrix exists) but must agree to ~1e-9 — a sanity anchor that
    // the closed forms are the right formulas, not just deterministic
    val li = spark.read.parquet(s"${TestSpark.sfDir}/lineitem.parquet")
    val want = li.agg(
      corr("l_quantity", "l_extendedprice"),
      covar_samp("l_quantity", "l_extendedprice")).collect()(0)
    val got = Analyze.corrMatrix(li, Seq("l_quantity", "l_extendedprice")).collect()(0)
    assert(math.abs(got.getDouble(3) - want.getDouble(0)) < 1e-6)
    assert(math.abs(got.getDouble(4) - want.getDouble(1)) < math.abs(want.getDouble(1)) * 1e-9)
  }

  test("empty input: columnStats reports 0 rows / 0 ndv; histogram is empty") {
    val empty = Seq.empty[(Long, Option[Double])].toDF("id", "score")
    val s = Analyze.columnStats(empty, Seq("score")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(s === Seq(("score", 0L, 0L)))
    assert(Analyze.histogram(empty, "score").collect().isEmpty)
  }
}
