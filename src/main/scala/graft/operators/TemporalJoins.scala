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
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"),
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
  )

  val oracles: Map[String, String] = Map(
    "q_asof_purchase" ->
      """SELECT e.event_id, e.user_id, e.ts, p.event_id AS last_purchase_id,
        |  p.ts AS last_purchase_ts
        |FROM (SELECT event_id, user_id, cast(ts AS timestamp) AS ts FROM events) e
        |ASOF LEFT JOIN (
        |  SELECT user_id, cast(ts AS timestamp) AS ts, event_id
        |  FROM events WHERE event_type = 'purchase') p
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
  )
}
