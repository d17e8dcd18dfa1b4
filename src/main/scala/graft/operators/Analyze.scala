package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ANALYZE-style table profiling as a reusable entry point: the
  * optimizer-stats pair (per-column statistics + equi-width histogram)
  * that [[CoreOps.qColumnStats]] / [[CoreOps.qHistogram]] pin against
  * their DuckDB oracles, generalized from the hardcoded `orders`
  * profile to any DataFrame / column set. The reference's analogue is
  * its rowcount bookkeeping (body:1046-1050 counts per load into the
  * audit row); a query engine's ANALYZE widens that to the stats the
  * planner actually consumes.
  *
  * Scale shape (unchanged from the oracled faces):
  *  - [[columnStats]] runs one full-scan aggregate PER profiled column
  *    (exact NDV must shuffle that column's distinct values). A
  *    deployment profiling 100 TB swaps `countDistinct` for the HLL
  *    sketch (`approx_count_distinct`, q_approx_distinct's bounded
  *    pattern) and all scans collapse into ONE pass — the exact face
  *    stays because it is the one DuckDB can re-derive bit-for-bit.
  *  - [[histogram]] is two scans: a 1-row min/max aggregate broadcast
  *    back onto the table, then a groupBy on the derived bin id
  *    (keys = bin count). Equi-DEPTH instead needs a global sort or
  *    quantile sketch — q_quantiles / q_approx_quantiles cover that.
  */
object Analyze {

  /** One long-form stats row per profiled column: ndv, null fraction,
    * stringified min/max (heterogeneous column types share the
    * long-form schema). Exactly [[CoreOps.qColumnStats]]'s shape. */
  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats needs at least one column")
    val n = count(lit(1))
    def statsOf(c: String): DataFrame =
      df.agg(
        lit(c).as("column_name"),
        n.as("n_rows"),
        countDistinct(col(c)).as("ndv"),
        round(sum(col(c).isNull.cast("int")) / n.cast("double"), 6).as("null_frac"),
        min(col(c)).cast("string").as("min_value"),
        max(col(c)).cast("string").as("max_value"))
    cols.map(statsOf).reduce(_.unionByName(_)).orderBy("column_name")
  }

  /** Equi-width histogram of a numeric column over `bins` fixed-width
    * buckets spanning [min, max]. NULLs are excluded (they are already
    * accounted as `null_frac` in [[columnStats]]); a constant column
    * (min == max) degenerates to every row in bin 0. Internal span
    * aliases are prefixed so a profiled column named `lo`/`hi` cannot
    * collide. */
  def histogram(df: DataFrame, c: String, bins: Int = 10): DataFrame = {
    require(bins > 0, "histogram needs a positive bin count")
    val span = df.agg(min(col(c)).as("__graft_lo"), max(col(c)).as("__graft_hi"))
    // The constant-column guard must short-circuit BEFORE the division:
    // 0/0 is NaN, and a NaN→long cast is an error under ANSI mode.
    val bin = when(col("__graft_hi") === col("__graft_lo"), lit(0L))
      .otherwise(least(floor((col(c) - col("__graft_lo"))
        * lit(bins.toDouble) / (col("__graft_hi") - col("__graft_lo")))
        .cast(LongType), lit(bins - 1L)))
    df.filter(col(c).isNotNull)
      .crossJoin(broadcast(span))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        round(min(col(c)), 2).as("bin_min"),
        round(max(col(c)), 2).as("bin_max"))
      .orderBy("bin")
  }

  /** The ANALYZE entry point: profile `cols` and histogram `histCol`
    * in one call, returning the stats pair the planner story needs. */
  def analyzeTable(df: DataFrame, cols: Seq[String], histCol: String,
      bins: Int = 10): (DataFrame, DataFrame) =
    (columnStats(df, cols), histogram(df, histCol, bins))
}
