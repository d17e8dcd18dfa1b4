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

  /** Pairwise Pearson correlation + sample covariance over numeric
    * columns — one row per unordered pair, ALL pairs from ONE full-scan
    * aggregate (the moment sums Σx, Σx², Σxy per pair live in a single
    * 1-row agg; the per-pair rows are then unioned selects OVER that
    * broadcast row, so the table is read once however many pairs are
    * profiled).
    *
    * Determinism is the reason this exists instead of `corr()`/
    * `covar_samp()`: the built-ins stream double co-moments whose low
    * bits depend on partition order, which a differential gate cannot
    * tolerate. Here every moment is an EXACT decimal(38,8) sum (inputs
    * cast to decimal(18,4) first — exact for the ≤2-dp money/quantity
    * columns this profiles), and the classic closed forms
    * corr = (n·Σxy − Σx·Σy) / √((n·Σx² − Σx²ᵗᵒᵗ)(n·Σy² − Σy²ᵗᵒᵗ)),
    * covar_samp = (Σxy − Σx·Σy/n) / (n−1)
    * evaluate in double ONCE at the end — identical exact inputs +
    * identical association order ⇒ identical IEEE bits on any engine.
    * Rows with a NULL in either column of a pair are excluded pairwise
    * (the SQL-standard corr/covar semantics).
    *
    * The moment row is COLLECTED — one row of control-plane metadata
    * per call — and the pair rows derive from it locally, because a
    * lazy union-of-selects over the shared aggregate gets its columns
    * pruned per branch by Catalyst, splitting the one aggregate into
    * |pairs| scans. Collecting pins the single scan by construction
    * (PlanSpec asserts the returned frame contains NO file scan). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix needs at least two columns")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    // cast each column to decimal ONCE in a projection below the
    // aggregate — the per-pair moment expressions otherwise repeat the
    // double→decimal conversion up to 5·|pairs| times per row, which
    // dominates the scan at bench scale
    val projected = df.select(cols.map(c => col(c).cast("decimal(18,4)").as(c)): _*)
    def dec(c: String) = col(c)
    val momentCols = pairs.flatMap { case (x, y) =>
      val both = dec(x).isNotNull && dec(y).isNotNull
      val gx = when(both, dec(x))
      val gy = when(both, dec(y))
      Seq(count(when(both, lit(1))), sum(gx), sum(gy),
        sum(gx * gx), sum(gy * gy), sum(gx * gy))
    }
    val m = projected.agg(momentCols.head, momentCols.tail: _*).collect()(0)
    def dbl(i: Int): Double =
      if (m.isNullAt(i)) Double.NaN else m.getDecimal(i).doubleValue
    val out = pairs.zipWithIndex.map { case ((x, y), p) =>
      val i = p * 6
      val nRows = m.getLong(i)
      if (nRows == 0L)
        // zero overlap: NULL stats, matching SQL's NULL-sum arithmetic
        // (a NaN here would diverge from the oracle's closed form)
        (x, y, 0L, Option.empty[Double], Option.empty[Double])
      else {
        val n = nRows.toDouble
        val (sx, sy, sxx, syy, sxy) = (dbl(i + 1), dbl(i + 2), dbl(i + 3), dbl(i + 4), dbl(i + 5))
        // the exact association order of the SQL twin, in IEEE doubles
        val corr = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        val covar = (sxy - sx * sy / n) / (n - 1.0)
        // degenerate pairs (1 row, constant column) yield NaN/Inf, which
        // BigDecimal cannot hold — pass them through unrounded
        def r6(v: Double): Double =
          if (java.lang.Double.isFinite(v))
            BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          else v
        (x, y, nRows, Some(r6(corr)), Some(r6(covar)))
      }
    }.sortBy(t => (t._1, t._2))
    import df.sparkSession.implicits._
    out.toDF("col_x", "col_y", "n", "corr", "covar_samp")
  }
}
