package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
