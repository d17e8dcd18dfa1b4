package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Salted equi-join for skewed keys (SURVEY §7.6 scale toolkit, alongside
  * bucket caps and bounded LSH blocks).
  *
  * When one join key dominates (a "hot" customer, a boilerplate document
  * prefix), a plain shuffle join sends every row of that key to ONE
  * reducer. Salting splits each hot key into `saltFactor` sub-keys:
  * the large side gets a deterministic salt from its row identity, the
  * small side is replicated once per salt value — same join result, hot
  * keys spread over `saltFactor` reducers.
  *
  * Deterministic by construction (salt = xxhash64 of the large side's
  * identity columns, no RNG), so results are stable across retries and
  * partitionings — required by the differential gate.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) solves the same problem at runtime by splitting oversized
  * partitions; explicit salting remains the tool when the skew is in the
  * KEY ITSELF (one key bigger than any splittable partition) rather than
  * in partition sizing.
  */
object SkewJoin {

  /** Join `large` with `small` on `key` (equi-join), salting the large
    * side by a hash of `identityCols` (columns that distinguish its rows,
    * e.g. the primary key). `small` is replicated `saltFactor` times.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      identityCols: Seq[String],
      saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // Right/full-outer would emit one null-extended row PER SALT REPLICA
    // for unmatched small-side rows — not the plain join's result. Only
    // join types where unmatched SMALL rows vanish (or the large side
    // drives the output) are salt-safe.
    val safe = Set("inner", "left", "leftouter", "leftsemi", "leftanti",
      "semi", "anti", "cross")
    require(safe(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support joinType '$joinType': unmatched small-side rows " +
        "would duplicate per salt replica (use the plain join or AQE skew handling)")
    val saltedLarge = large.withColumn("__salt", saltColumn(identityCols, saltFactor))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    saltedLarge.join(saltedSmall, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** The deterministic salt assignment the large side shuffles under —
    * package-private so SkewJoinSpec measures the EXACT layout the join
    * produces (a reimplementation in the spec could silently drift). */
  private[graft] def saltColumn(identityCols: Seq[String], saltFactor: Int): Column =
    pmod(xxhash64(identityCols.map(col): _*), lit(saltFactor.toLong))

  /** Salt fan-out for the registered face: each hot key spreads across
    * this many reducers. Sized like a straggler budget, not like the
    * partition count — the dim side pays the factor in replication. */
  private[graft] val SkewSalts = 8

  /** Registered face (q_skew_join): every event enriched with its user's
    * first-seen day through the salted join — user activity is the
    * canonical zipf key — then rolled up per cohort day. The dim is
    * events' own first-touch aggregate (map-side combine absorbs key
    * skew in the GROUPBY on its own; it is the enrichment JOIN that
    * needs the salt). The dim side carries a shuffle_hash hint: a
    * broadcast would make the salt dead weight, and the operator exists
    * to shape the shuffled case — at a scale where the dim fits a
    * broadcast, broadcast INSTEAD of salting.
    *
    * Salt-invariance (the result equals the plain join's) is what lets
    * the plain-SQL DuckDB oracle gate the salted plan. */
  def qSkewJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(col("event_id"), col("user_id"), col("ts"))
    val dim = e.groupBy("user_id").agg(date_trunc("DAY", min(col("ts"))).as("first_day"))
    saltedJoin(e.select("event_id", "user_id"), dim.hint("shuffle_hash"),
        "user_id", Seq("event_id"), SkewSalts)
      .groupBy("first_day")
      .agg(count(lit(1)).as("n_events"), countDistinct("user_id").as("n_users"))
      .orderBy("first_day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_skew_join" -> qSkewJoin _,
  )

  val oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """WITH dim AS (
        |  SELECT user_id,
        |    cast(date_trunc('day', min(cast(ts AS timestamp))) AS timestamp) AS first_day
        |  FROM events GROUP BY 1)
        |SELECT d.first_day, count(*) AS n_events, count(DISTINCT e.user_id) AS n_users
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
