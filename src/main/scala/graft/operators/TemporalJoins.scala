package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators Spark lacks natively (the engine-design
  * preference order starts with "compose existing ops if semantics
  * allow" — both of these compose, no custom plan node needed):
  *
  *  - **As-of join** (backward, inclusive): for each left row, the latest
  *    right row with `rightTs <= leftTs` on the same key. Implemented as
  *    ONE union + window pass: tag both sides, sort within key by (ts,
  *    side) with right rows first at equal ts, and carry the right values
  *    forward with `last_value(ignoreNulls)`. One shuffle on the key — no
  *    range-condition join, no per-key collect, so a 100 TB event log
  *    as-of joins at the cost of a window aggregation.
  *
  *  - **Range join** (interval predicate): banded into an equi-join on
  *    (key, time bucket). Each probe interval of width ≤ bucket span
  *    touches exactly two buckets, so the build side joins on equality
  *    and the exact range predicate filters after — the classic remedy
  *    for Catalyst planning an inequality join as a nested loop.
  */
object TemporalJoins {

  /** Generic backward as-of join.
    *
    * @param left      probe side
    * @param right     reference side (values carried forward)
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTs    event-time column on `left`
    * @param rightTs   event-time column on `right`
    * @param valueCols columns of `right` to attach (emitted as
    *                  `asof_<name>`, NULL when no right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // The right row travels as ONE struct: last(ignoreNulls) then skips
    // exactly the left rows (whose struct is null) — never a right row
    // with a NULL value column, and never columns stitched from different
    // right rows. Side tag: right rows sort BEFORE left rows at equal
    // timestamps, so "inclusive" means a left row sees a same-ts right row.
    val rowStruct = struct(valueCols.map(col): _*)
    val taggedRight = leftCols.foldLeft(
      right.select(keys.map(col) ++ Seq(col(rightTs).as("__ts"),
        rowStruct.as("__rv")): _*).withColumn("__side", lit(0))) {
      (df, c) => if (df.columns.contains(c)) df else df.withColumn(c, lit(null))
    }
    val taggedLeft = left.withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__rv", lit(null).cast(taggedRight.schema("__rv").dataType))
    val cols = leftCols ++ Seq("__ts", "__side", "__rv")
    val unioned = taggedLeft.select(cols.map(col): _*)
      .unionByName(taggedRight.select(cols.map(col): _*))
    // Right rows tying on (key, ts) order by their value struct, so the
    // carried row is deterministic across retries/partitionings (the
    // greatest tuple wins). Left-left ties are harmless: left rows are
    // null in __rv and never affect each other's carry.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(c => col(s"__carried.$c").as(s"asof_$c")): _*)
  }

  /** Each event annotated with the user's most recent (≤ ts) purchase —
    * the "attach reference data as of event time" shape. */
  def qAsofPurchase(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
    // Tie policy made EXPLICIT on both faces: two purchases by one user
    // at the same ts collapse to the max event_id BEFORE the as-of.
    // asofJoin itself carries a deterministic struct-max on ties, but
    // DuckDB's ASOF JOIN picks an unspecified tied row — pre-aggregating
    // on both sides is what keeps the differential gate deterministic
    // if the generator ever emits same-microsecond purchases.
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
      .select(col("user_id"), col("ts"), col("purchase_id"),
        col("ts").as("purchase_ts"))
    asofJoin(e, purchases, Seq("user_id"), "ts", "ts", Seq("purchase_id", "purchase_ts"))
      .withColumnRenamed("asof_purchase_id", "last_purchase_id")
      .withColumnRenamed("asof_purchase_ts", "last_purchase_ts")
      .orderBy("event_id")
  }

  /** Generic banded range join count: for each left row, how many right
    * rows of the same user fall in `(ts, ts + 1 hour]`. Right rows keep
    * their hour bucket, each left row probes (bucket, bucket+1), the
    * exact interval filters post-join. Both inputs: (event_id, user_id,
    * ts). The band-boundary correctness (an interval of width ≤ bucket
    * span touches exactly two buckets, inclusive/exclusive ends) is
    * property-tested against the naive predicate in TemporalJoinsSpec. */
  def rangeJoinCounts(left: DataFrame, right: DataFrame): DataFrame = {
    val BucketUs = 3600L * 1000000
    // integer `div` (micros epoch values would lose precision in the
    // double-typed `/` operator)
    val bucket: Column = expr(s"unix_micros(ts) div $BucketUs")
    val clicks = right
      .select(col("user_id"), col("ts").as("c_ts"), bucket.as("bucket"))
    val purchases = left
      .select(col("event_id"), col("user_id"), col("ts").as("p_ts"),
        explode(array(bucket, bucket + 1)).as("bucket"))
    val inRange = col("c_ts") > col("p_ts") &&
      unix_micros(col("c_ts")) <= unix_micros(col("p_ts")) + BucketUs
    purchases.join(clicks, Seq("user_id", "bucket"), "left")
      .groupBy("event_id")
      .agg(count(when(inRange, lit(1))).as("n_clicks"))
      .orderBy("event_id")
  }

  /** Generic INTERVAL-OVERLAP join: pairs of (left interval, right
    * interval) that intersect, both sides half-open `[start, end)` in
    * epoch micros — the two-sided generalization of [[rangeJoinCounts]]
    * (whose right side is a point). Catalyst plans a raw inequality
    * join as a nested loop; banding makes it an equi-join:
    *
    *  1. each interval explodes into the band ids it covers
    *     (`start div w .. (end-1) div w` — arbitrary lengths allowed,
    *     unlike the ≤-one-band probe of the range join);
    *  2. the band equi-join bounds candidate pairs;
    *  3. the exact predicate `ls < re && rs < le` keeps true overlaps;
    *  4. a pair sharing several bands is kept ONCE, at the canonical
    *     band `max(ls, rs) div w` — the first band of the intersection,
    *     which both sides necessarily cover. No distinct, no window:
    *     exactly-once by arithmetic.
    *
    * Band width trades replication (long intervals cover many bands)
    * against candidate precision (wide bands pair distant intervals);
    * at 100 TB, size it near the median interval length. Extra columns
    * on either input ride through untouched (names must not collide).
    *
    * `maxBandsPerRow` bounds the per-row explosion: ONE corrupt record
    * (a garbage timestamp, an open-ended interval encoded as
    * Long.MaxValue) would otherwise make `sequence()` throw its opaque
    * max-array-length error — or allocate gigabytes — and abort the
    * whole job. The guard fails with the offending interval named
    * instead. The default (2^20 bands) is far above any sanely-sized
    * band width yet small enough that a single row can't OOM a task.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column, bandMicros: Long,
      maxBandsPerRow: Long = DefaultMaxBandsPerRow): DataFrame = {
    require(bandMicros > 0, s"bandMicros must be positive, got $bandMicros")
    require(maxBandsPerRow > 0, s"maxBandsPerRow must be positive, got $maxBandsPerRow")
    // exact long floor-div: subtract the remainder FIRST so the double
    // division divides two exactly-representable values (epoch micros
    // ≪ 2^53) whose quotient is an integer — a raw c/band could truncate
    // one band off at exact multiples
    def floorDiv(c: Column): Column =
      ((c - pmod(c, lit(bandMicros))) / lit(bandMicros)).cast("long")
    def bands(s: Column, e: Column): Column = {
      val lo = floorDiv(s)
      val hi = floorDiv(e - lit(1L))
      // assert_true yields NULL on pass, so coalesce routes `lo` through
      // the guard without the optimizer being able to prune it; on a
      // pathological row it raises with the interval's values instead of
      // sequence()'s opaque array-length error
      val guarded = coalesce(
        assert_true(hi - lo < lit(maxBandsPerRow), format_string(
          s"intervalOverlapJoin: interval [%d, %d) spans more than " +
            s"$maxBandsPerRow bands of $bandMicros micros — corrupt or " +
            "open-ended timestamp?",
          s.cast("long"), e.cast("long"))).cast("long"),
        lo)
      explode(sequence(guarded, hi))
    }
    // empty intervals ([s, e) with e <= s) overlap nothing and would
    // band backwards through sequence's descending step — drop them here
    val l = left.filter(lEnd > lStart)
      .withColumn("__ls", lStart).withColumn("__le", lEnd)
      .withColumn("__band", bands(col("__ls"), col("__le")))
    val r = right.filter(rEnd > rStart)
      .withColumn("__rs", rStart).withColumn("__re", rEnd)
      .withColumn("__band", bands(col("__rs"), col("__re")))
    l.join(r, Seq("__band"))
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le"))
      .filter(col("__band") === floorDiv(greatest(col("__ls"), col("__rs"))))
      .drop("__band", "__ls", "__le", "__rs", "__re")
  }

  /** Registered face (q_interval_join): per-user daily activity spans
    * overlapped against corpus-wide "busy hours" (hours with ≥
    * [[BusyHourMin]] events) — the "which user sessions hit the rush
    * window" shape. The busy-hour side is tiny (≤ |hours| rows), so the
    * band join broadcasts at any corpus scale; the activity side never
    * shuffles for the join itself. */
  private[graft] val BusyHourMin = 20

  /** Per-row band-explosion cap for [[intervalOverlapJoin]] (see its
    * scaladoc): 2^20 — generous for any sane band sizing, small enough
    * that one corrupt interval can't allocate its way to an OOM. */
  val DefaultMaxBandsPerRow: Long = 1L << 20

  def qIntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000000
    val e = Tables.events(s, dir)
    // half-open activity span: [first event, last event + 1s)
    val act = e.groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(unix_micros(min(col("ts"))).as("act_s"),
        (unix_micros(max(col("ts"))) + lit(1000000L)).as("act_e"))
    val busy = e.groupBy(date_trunc("HOUR", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= BusyHourMin)
      .select(unix_micros(col("h")).as("busy_s"),
        (unix_micros(col("h")) + lit(HourUs)).as("busy_e"))
    intervalOverlapJoin(act, col("act_s"), col("act_e"),
        busy, col("busy_s"), col("busy_e"), HourUs)
      .groupBy("user_id", "day")
      .agg(count(lit(1)).as("n_busy_hours"))
      .orderBy("user_id", "day")
  }

  /** For each purchase, clicks by the same user within the following hour
    * — the registered face of [[rangeJoinCounts]] over the events table. */
  def qRangeJoinClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    rangeJoinCounts(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_asof_purchase"    -> qAsofPurchase _,
    "q_range_join"       -> qRangeJoinClicks _,
    "q_interval_join"    -> qIntervalJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q_asof_purchase" ->
      """SELECT e.event_id, e.user_id, e.ts, p.event_id AS last_purchase_id,
        |  p.ts AS last_purchase_ts
        |FROM (SELECT event_id, user_id, cast(ts AS timestamp) AS ts FROM events) e
        |ASOF LEFT JOIN (
        |  SELECT user_id, cast(ts AS timestamp) AS ts, max(event_id) AS event_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2) p
        |ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT p.event_id, count(c.event_id) AS n_clicks
        |FROM (SELECT event_id, user_id, cast(ts AS timestamp) AS ts
        |      FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT event_id, user_id, cast(ts AS timestamp) AS ts
        |           FROM events WHERE event_type = 'click') c
        |  ON c.user_id = p.user_id AND c.ts > p.ts
        | AND c.ts <= p.ts + INTERVAL 1 HOUR
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the oracle replays the overlap as a plain inequality join on the
    // same half-open epoch-micro arithmetic — banding is plan shape, not
    // semantics, so the naive join is the correct reference
    "q_interval_join" ->
      s"""WITH act AS (
        |  SELECT user_id,
        |    cast(date_trunc('day', cast(ts AS timestamp)) AS timestamp) AS day,
        |    epoch_us(min(cast(ts AS timestamp))) AS act_s,
        |    epoch_us(max(cast(ts AS timestamp))) + 1000000 AS act_e
        |  FROM events GROUP BY 1, 2),
        |busy AS (
        |  SELECT epoch_us(h) AS busy_s, epoch_us(h) + 3600000000 AS busy_e
        |  FROM (SELECT cast(date_trunc('hour', cast(ts AS timestamp)) AS timestamp) AS h,
        |               count(*) AS n
        |        FROM events GROUP BY 1)
        |  WHERE n >= ${BusyHourMin})
        |SELECT a.user_id, a.day, count(*) AS n_busy_hours
        |FROM act a JOIN busy b
        |  ON a.act_s < b.busy_e AND b.busy_s < a.act_e
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
