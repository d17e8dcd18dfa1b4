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

  test("stored model ≡ in-query: weights, ranks and schema bit-for-bit over the training corpus") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val path = tmpPath("dsir-eq")
    TextOps.writeDsirModel(spark, docs, col("lang") === "en", path)
    val stored = TextOps.dsirSelectStored(spark, docs, path, k = 50).collect().toSeq
    val inQuery = TextOps.dsirSelect(docs, col("lang") === "en", k = 50,
      featureOf = TextOps.dsirBucket(TextOps.DsirBuckets)).collect().toSeq
    assert(stored === inQuery,
      "materializing the model must not move a weight or a rank")
  }

  test("ingest loop: stored score at every append depth ≡ in-query over the union") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val path = tmpPath("dsir-ingest")
    val b0 = docs.filter(col("doc_id") % 3 === 0)
    val b1 = docs.filter(col("doc_id") % 3 === 1)
    val b2 = docs.filter(col("doc_id") % 3 === 2)
    val en = col("lang") === "en"
    TextOps.writeDsirModel(spark, b0, en, path)
    TextOps.appendDsirBatch(spark, b1, en, path, 1L)
    // replay of batch 1 must be a no-op (idempotent dynamic overwrite)
    TextOps.appendDsirBatch(spark, b1, en, path, 1L)
    TextOps.appendDsirBatch(spark, b2, en, path, 2L)
    def weights(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val stored = weights(TextOps.dsirScoreStored(spark, docs, path))
    val union = weights(TextOps.dsirSelect(docs, en, k = Int.MaxValue,
      featureOf = TextOps.dsirBucket(TextOps.DsirBuckets)))
    assert(stored === union,
      "three appends (one replayed) must score exactly like a single-shot train")
    // as-of 1 reconstructs the b0+b1 model while scoring ALL docs (b2's
    // novel grams take the OOV floor, never drop)
    val asOf1 = weights(TextOps.dsirScoreStoredAsOf(spark, docs, path, asOf = 1L))
    val p01 = tmpPath("dsir-b01")
    TextOps.writeDsirModel(spark, b0.unionByName(b1), en, p01)
    val modelDocs = weights(TextOps.dsirScoreStored(spark, docs, p01))
    assert(asOf1 === modelDocs, "as-of slice must equal the pre-append model")
    assert(asOf1.keySet === stored.keySet,
      "every gram-bearing doc scores under the as-of model — OOV floors, no drops")
  }

  test("compaction folds batches score-preserving and bounds the as-of horizon") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val path = tmpPath("dsir-compact")
    val en = col("lang") === "en"
    TextOps.writeDsirModel(spark, docs.filter(col("doc_id") % 2 === 0), en, path)
    TextOps.appendDsirBatch(spark, docs.filter(col("doc_id") % 2 === 1), en, path, 3L)
    val before = TextOps.dsirScoreStored(spark, docs, path).collect().toSeq
    TextOps.compactDsirModel(spark, path, foldBelow = 10L)
    val after = TextOps.dsirScoreStored(spark, docs, path).collect().toSeq
    assert(before === after, "folding batch partitions must not move a weight")
    // folded states are gone — the shared horizon guard refuses loudly
    val e = intercept[IllegalArgumentException] {
      TextOps.dsirScoreStoredAsOf(spark, docs, path, asOf = 1L)
    }
    assert(e.getMessage.contains("oldest reconstructable"), e.getMessage)
    // the folded bootstrap IS the final state: as-of at/above the
    // horizon still serves
    assert(TextOps.dsirScoreStoredAsOf(spark, docs, path, asOf = 3L)
      .collect().toSeq === after)
  }

  test("retraction equals retraining on the survivors; replay no-ops; compaction absorbs") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val en = col("lang") === "en"
    val retr = col("doc_id") % 7 === 3
    val path = tmpPath("dsir-retract")
    TextOps.writeDsirModel(spark, docs, en, path)
    TextOps.retractDsirDocs(spark, path, docs.filter(retr), en)
    // exact replay is a no-op (the sidecar distinct collapses it)
    TextOps.retractDsirDocs(spark, path, docs.filter(retr), en)
    val survivors = docs.filter(!retr)
    val after = TextOps.dsirScoreStored(spark, survivors, path).collect().toSeq
    val p2 = tmpPath("dsir-retrain")
    TextOps.writeDsirModel(spark, survivors, en, p2)
    val retrain = TextOps.dsirScoreStored(spark, survivors, p2).collect().toSeq
    assert(after === retrain,
      "retracted and never-trained must be indistinguishable to a scorer")
    // retracting a doc the store never trained on refuses LOUDLY (the
    // repeated bigram drives its bucket's future count far past any
    // hash-collision mass the real corpus could hold there)
    val alien = Seq((999999L, "en",
      Seq.fill(80)("zzqqxv wwvvkk").mkString(" "))).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.retractDsirDocs(spark, path, alien, en)
    }
    assert(e.getMessage.contains("not trained into this store"), e.getMessage)
    // compaction with a covering watermark absorbs: sidecar cleared,
    // scores still equal the retrain
    TextOps.compactDsirModel(spark, path, foldBelow = 1L)
    assert(!graft.sources.Stores.hasTombstones(spark, path),
      "the covering fold must clear the tombstone sidecar")
    assert(TextOps.dsirScoreStored(spark, survivors, path).collect().toSeq === retrain,
      "physical absorption must not move a weight")
  }

  test("retraction as-of: corrections scope to admission membership") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sfDir)
    val en = col("lang") === "en"
    val late = col("doc_id") % 10 === 5
    val path = tmpPath("dsir-retr-asof")
    TextOps.writeDsirModel(spark, docs.filter(!late), en, path)
    TextOps.appendDsirBatch(spark, docs.filter(late), en, path, 7L)
    // retract docs that exist ONLY in batch 7: the as-of-6 model must
    // not shrink (they were no members then), while the live model must
    val lateRetr = late && col("doc_id") % 7 === 3
    TextOps.retractDsirDocs(spark, path, docs.filter(lateRetr), en)
    val asOf6 = TextOps.dsirScoreStoredAsOf(spark, docs, path, asOf = 6L)
      .collect().toSeq
    val pBoot = tmpPath("dsir-boot")
    TextOps.writeDsirModel(spark, docs.filter(!late), en, pBoot)
    assert(asOf6 === TextOps.dsirScoreStored(spark, docs, pBoot).collect().toSeq,
      "as-of 6 must equal the pure bootstrap model — batch-7 members' " +
        "corrections must not apply to a state they were never part of")
    val live = TextOps.dsirScoreStored(spark, docs, path).collect().toSeq
    val pSurv = tmpPath("dsir-surv")
    TextOps.writeDsirModel(spark, docs.filter(!lateRetr), en, pSurv)
    assert(live === TextOps.dsirScoreStored(spark, docs, pSurv).collect().toSeq,
      "the live model must equal a retrain without the retracted late docs")
  }

  test("an empty stored pool refuses to score loudly") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    val path = tmpPath("dsir-empty")
    TextOps.writeDsirModel(spark, empty, col("lang") === "en", path)
    val docs = Seq((1L, "en", "alpha beta gamma")).toDF("doc_id", "lang", "text")
    val e = intercept[IllegalArgumentException] {
      TextOps.dsirScoreStored(spark, docs, path).collect()
    }
    assert(e.getMessage.contains("empty pool distribution"), e.getMessage)
  }

  private def tmpPath(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag-").toFile
    d.delete(); d.getAbsolutePath
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
