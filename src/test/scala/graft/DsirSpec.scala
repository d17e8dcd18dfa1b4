package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** DSIR importance resampling (Xie et al. 2023): the DuckDB oracle pins
  * q_dsir's values; these pin the SEMANTICS (target-like docs outrank
  * off-target docs) and the hashing trick (bucketed features select
  * nearly the same set as raw grams — the claim that lets the
  * distribution frames stay B-row constants at 100 TB). */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("target-like documents outrank off-target documents") {
    // target slice: lang='en', all about one vocabulary; the pool adds
    // off-target docs sharing NO grams with the target and one mixed doc
    val docs = Seq(
      (1L, "en", "the quick brown fox jumps over the lazy dog"),
      (2L, "en", "the quick brown fox likes the lazy dog"),
      (3L, "xx", "zumba tango rumba salsa mambo cha cha"),
      (4L, "xx", "polka waltz foxtrot quickstep jive samba"),
      // pool doc WRITTEN LIKE the target but outside the target slice:
      // DSIR exists exactly to pull this one in
      (5L, "xx", "the quick brown fox and the lazy dog"),
      (6L, "xx", "tango salsa mambo zumba rumba dances")
    ).toDF("doc_id", "lang", "text")
    val sel = TextOps.dsirSelect(docs, col("lang") === "en", k = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // ranks: 1 = most target-like; every target-gram doc must outrank
    // every disjoint-vocabulary doc
    val targetLike = Seq(1L, 2L, 5L).map(sel)
    val offTarget = Seq(3L, 4L, 6L).map(sel)
    assert(targetLike.max < offTarget.min,
      s"target-vocabulary docs must outrank disjoint-vocabulary docs: $sel")
    // the non-en doc written in target vocabulary is SELECTED ahead of
    // the off-target docs — the resampling point
    assert(sel(5L) < offTarget.min, s"doc 5 is the resampling win: $sel")
  }

  test("domain edges: an empty target slice still selects (uniform target), short docs score nothing") {
    val docs = Seq(
      (1L, "xx", "alpha beta gamma delta"),
      (2L, "xx", "beta gamma delta epsilon"),
      (3L, "xx", "single"),           // <2 words: no bigrams, no score
      (4L, "xx", "")                  // empty: same
    ).toDF("doc_id", "lang", "text")
    // no doc matches the target: nt=0, every gram takes the Laplace
    // floor — the weights are all defined (no NaN/null) and the
    // selection is still deterministic
    val sel = TextOps.dsirSelect(docs, col("lang") === "en", k = 10).collect()
    assert(sel.map(_.getLong(0)).toSet === Set(1L, 2L),
      "only bigram-bearing docs are scorable; the empty target must not NaN them out")
    assert(sel.forall(r => !r.isNullAt(2) && !r.getDouble(2).isNaN),
      "empty-target weights take the smoothing floor, never NaN")
  }

  test("hashed-bucket features select nearly the same set as raw grams (the 100 TB path)") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val raw = TextOps.dsirSelect(docs, col("lang") === "en", k = 50)
      .select("doc_id").as[Long].collect().toSet
    val hashed = TextOps.dsirSelect(docs, col("lang") === "en", k = 50,
        featureOf = TextOps.dsirBucket(1 << 16))
      .select("doc_id").as[Long].collect().toSet
    assert(raw.nonEmpty && hashed.nonEmpty)
    val overlap = (raw & hashed).size.toDouble / raw.size
    assert(overlap >= 0.8,
      f"2^16 buckets must preserve the selection (overlap $overlap%.2f < 0.80) — " +
        "if hashing collapses the ranking, the deployment path is a different operator")
    // a pathologically small bucket count SHOULD distort — the spec
    // would be vacuous if any feature map passed the overlap bar
    val crushed = TextOps.dsirSelect(docs, col("lang") === "en", k = 50,
        featureOf = TextOps.dsirBucket(2))
      .select("doc_id").as[Long].collect().toSet
    assert((raw & crushed).size.toDouble / raw.size < overlap,
      "2 buckets must lose information vs 2^16 — otherwise the overlap bar proves nothing")
  }
}
