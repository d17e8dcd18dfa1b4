package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Search

/** Semantics of the retrieval operators on planted corpora (their values
  * are hash-verified against DuckDB oracles by the driver gate — these
  * tests pin the ranking/pairing BEHAVIOR on inputs where the right
  * answer is known by construction).
  */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25: term-dense doc ranks first, no-term docs are absent, ties break by doc_id") {
    val docs = Seq(
      1L -> "spark spark spark merge vector stream extra words here",
      2L -> "spark appears once in this otherwise unrelated text body",
      3L -> "nothing relevant in this document at all whatsoever here",
      4L -> "spark appears once in this otherwise unrelated text body",
    ).toDF("doc_id", "text")
    val got = Search.bm25(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // doc 3 has zero query terms: never retrieved
    assert(!got.map(_._1).contains(3L))
    // doc 1 matches all four terms with the highest tf: top rank
    assert(got.head._1 === 1L && got.head._3 === 4L)
    // docs 2 and 4 are identical: equal scores, doc_id ascending
    val twins = got.filter(r => r._1 == 2L || r._1 == 4L)
    assert(twins.map(_._1).toSeq === Seq(2L, 4L))
    assert(twins(0)._2 === twins(1)._2 && twins.forall(_._3 == 1L))
    // all retrieved scores are positive and sorted descending
    assert(got.forall(_._2 > 0.0))
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }

  test("bm25: rarer term outweighs commoner term at equal tf and length") {
    // 'vector' appears in 1 doc, 'spark' in 3 → idf(vector) > idf(spark);
    // the two probe docs are same length with tf=1, so ranking is idf-only
    val docs = Seq(
      1L -> "spark one two three four five",
      2L -> "spark one two three four five",
      3L -> "spark six seven eight nine ten",
      4L -> "vector six seven eight nine ten",
    ).toDF("doc_id", "text")
    val scores = Search.bm25(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(4L) > scores(3L),
      s"idf must favor the rare term: ${scores(4L)} vs ${scores(3L)}")
  }

  test("fuzzy join: pairs form only within the 8-char block, distance is exact") {
    val docs = Seq(
      // block "same pre": three members, two near, one far
      10L -> "same prefix alpha bravo charlie delta echo foxtrot",
      11L -> "same prefix alpha bravo charlie delta echo foxtrox", // 1 sub at pos 40- (within prefix)
      12L -> "same prefix zzz yyy xxx www vvv uuu ttt sss rrr qqq", // same block, far tail
      // different first-8 chars: never compared against the block above
      13L -> "other prefix alpha bravo charlie delta echo foxtrot",
    ).toDF("doc_id", "text")
    val got = Search.fuzzyPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // identical 40-char prefixes -> distance 0 (11's edit is past char 40)
    assert(got.contains((10L, 11L, 0L)))
    // 13 shares a 40-char tail with 10 but a different block: absent
    assert(!got.exists(p => p._1 == 13L || p._2 == 13L))
    // 12 shares the block but its prefix diverges beyond the cutoff:
    // no pair involving it may be reported at all
    val p12 = got.filter(p => p._1 == 12L || p._2 == 12L)
    assert(p12.isEmpty,
      s"doc 12's prefix is > max-dist edits from every block member: $p12")
  }

  test("stored search index: probe equals the in-query BM25 verbatim") {
    val dir = TestSpark.sfDir
    val inQuery = SparkEntry.queries("q_bm25")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val stored = SparkEntry.queries("q_bm25_probe")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(inQuery.nonEmpty)
    assert(stored === inQuery,
      "the stored probe must be bit-identical to the in-query scorer")
  }

  test("stored search index: bootstrap+appends == full bootstrap == in-query; replay is idempotent") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDir
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchidx").toString + "/idx"
    def probeAll(): Seq[(Long, Double, Long)] = SearchProbe.scores(spark, path)
    // bootstrap on one third, append the other two thirds as two batches
    Search.writeSearchIndexFrom(spark, docs.filter(col("doc_id") % 3 === 0), path)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 1L)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 2), path, 2L)
    val grown = probeAll()
    val wantFull = Search.bm25(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(grown === wantFull,
      "a grown index must score exactly like the full corpus in-query")
    // a literal replay of batch 2 overwrites itself: nothing changes
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 2), path, 2L)
    assert(probeAll() === wantFull, "a replayed batch must leave the index unchanged")
  }

  test("append guard: cross-batch doc re-ingest is rejected, disjoint and same-batch pass") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchguard").toString + "/idx"
    Search.writeSearchIndexFrom(spark, docs.filter(col("doc_id") % 3 === 0), path)
    // disjoint batch: the guard passes and the append lands
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 1L,
      assertNewDocs = true)
    // a same-batch-id replay is the idempotent case: the guard passes
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 1L,
      assertNewDocs = true)
    val before = spark.read.parquet(path).count()
    // the SAME docs under a NEW batch id would double-count: rejected,
    // and nothing is written (the guard runs before either artifact)
    val e = intercept[IllegalArgumentException] {
      Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 2L,
        assertNewDocs = true)
    }
    assert(e.getMessage.contains("doc-disjointness"))
    assert(spark.read.parquet(path).count() === before,
      "a rejected append must leave the store untouched")
  }

  test("append guard bootstraps a fresh store from batch 0") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchboot").toString + "/idx"
    // no store exists at path: the guard must pass vacuously, not crash
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 0), path, 0L,
      assertNewDocs = true)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 1L,
      assertNewDocs = true)
    // from batch 1 on the guard has teeth: a cross-batch re-ingest rejects
    val e = intercept[IllegalArgumentException] {
      Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 0), path, 2L,
        assertNewDocs = true)
    }
    assert(e.getMessage.contains("doc-disjointness"))
  }

  test("membership sidecar is docs-sized and backfills a store that lacks it") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchback").toString + "/idx"
    Search.writeSearchIndexFrom(spark, docs.filter(col("doc_id") % 3 === 0), path)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 1L)
    // the guard's read target is |docs|-cardinality, not |postings|
    val members = spark.read.parquet(path + "/_docs")
    val nDocs = spark.read.parquet(path).select("doc_id").distinct().count()
    assert(members.count() === nDocs,
      "membership must hold exactly one row per stored document")
    assert(members.count() < spark.read.parquet(path).count(),
      "membership must be smaller than the posting corpus it summarizes")
    // delete the sidecar (a pre-sidecar store): the next append backfills
    // it from the postings before anything lands, so the guard still
    // knows about BATCH 1's docs afterwards
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "/_docs"), true)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 2), path, 2L,
      assertNewDocs = true) // disjoint: passes over the backfilled sidecar
    val e = intercept[IllegalArgumentException] {
      Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 3L,
        assertNewDocs = true)
    }
    assert(e.getMessage.contains("doc-disjointness"),
      "backfill must restore membership for batches written before the sidecar existed")
  }

  test("search index compaction folds below the watermark; scores and newer replays survive") {
    import org.apache.spark.sql.functions.{col, sum}
    val dir = TestSpark.sfDir
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchcompact").toString + "/idx"
    Search.writeSearchIndexFrom(spark, docs.filter(col("doc_id") % 3 === 0), path)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 1), path, 0L)
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 2), path, 1L)
    def scores(): Seq[(Long, Double, Long)] = SearchProbe.scores(spark, path)
    def batchDirs(): Set[String] = graft.sources.Stores.subPartitionDirs(spark, path)
      .filter(_.startsWith("batch_id="))
    val want = scores()
    assert(batchDirs() === Set("batch_id=-1", "batch_id=0", "batch_id=1"))
    // fold batch 0 (the replay watermark has passed it); keep batch 1
    Search.compactSearchIndex(spark, path, foldBelow = 1L)
    assert(batchDirs() === Set("batch_id=-1", "batch_id=1"),
      "batches below the watermark must fold into the bootstrap")
    assert(scores() === want, "compaction must never change a score")
    val statRows = spark.read.parquet(path + "/_stats").collect()
    assert(statRows.length === 2, "folded sidecar rows must merge into one")
    // batch 1 is still replay-addressable: a literal replay changes nothing
    Search.appendSearchIndexBatch(spark, docs.filter(col("doc_id") % 3 === 2), path, 1L)
    assert(scores() === want, "the preserved batch's replay contract must survive compaction")
    // nothing left below the watermark: compaction is a detected no-op
    Search.compactSearchIndex(spark, path, foldBelow = 1L)
    assert(batchDirs() === Set("batch_id=-1", "batch_id=1") && scores() === want)
  }

  test("hybrid search: RRF score is exactly the rank-derived sum, ordered and bounded") {
    val rows = SparkEntry.queries("q_hybrid_search")(spark, TestSpark.sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { case (docId, lex, dense, rrf) =>
      assert(lex.isDefined || dense.isDefined, s"doc $docId fused from no leg")
      val want = BigDecimal(
        lex.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          dense.map(r => 1.0 / (60 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf === want, s"doc $docId: rrf $rrf, want $want")
      lex.foreach(r => assert(r >= 1 && r <= 20))
      dense.foreach(r => assert(r >= 1 && r <= 20))
    }
    assert(rows.map(_._4).toSeq === rows.map(_._4).sortBy(-_).toSeq,
      "fused results must come back score-descending")
  }

  test("fuzzy join: reported distance matches a reference Levenshtein") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val t1 = "abcdefgh kitten sat on the little branch today"
    val t2 = "abcdefgh sitting sat on the little branch here"
    val docs = Seq(20L -> t1, 21L -> t2).toDF("doc_id", "text")
    val got = Search.fuzzyPairs(docs).collect()
    assert(got.length === 1)
    assert(got(0).getLong(2) === lev(t1.take(40), t2.take(40)).toLong)
  }

  test("doc retraction: scores equal never-indexed exactly; compaction purges and re-admits") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDir
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchretract").toString + "/idx"
    Search.writeSearchIndexFrom(spark, docs, path)
    val before = SearchProbe.scores(spark, path)
    assert(before.nonEmpty)
    // retract three scoring docs + one non-scoring doc: the stored face
    // must now equal the in-query scorer over the SURVIVING corpus
    // bit-for-bit — the N/avgdl correction is what this pins (dropping
    // rows without the stats delta would leave every survivor's score
    // skewed, not just remove rows)
    val retracted = before.take(3).map(_._1) :+
      docs.select("doc_id").collect().map(_.getLong(0)).max
    Search.retractSearchDocs(spark, path, retracted)
    val surviving = docs.filter(!col("doc_id").isin(retracted: _*))
    def want(): Seq[(Long, Double, Long)] = Search.bm25(surviving).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(SearchProbe.scores(spark, path) === want(),
      "retracted must be indistinguishable from never-indexed, scores included")
    // a replayed retraction is idempotent (the correction is recomputed,
    // not re-appended)
    Search.retractSearchDocs(spark, path, retracted)
    assert(SearchProbe.scores(spark, path) === want())
    // physical purge: rows, membership and tombstones clear in one swap,
    // the correction folds into the bootstrap stats
    Search.compactSearchIndex(spark, path, foldBelow = 0L)
    assert(!new java.io.File(path + "/_tombstones").exists)
    assert(spark.read.parquet(path).filter(col("doc_id").isin(retracted: _*)).count() === 0)
    assert(SearchProbe.scores(spark, path) === want(), "scores unchanged by the purge")
    // ...and the purged doc_id is genuinely new again: the disjointness
    // guard admits its re-ingest (it REJECTED while tombstoned)
    val one = docs.filter(col("doc_id") === retracted.head)
    Search.appendSearchIndexBatch(spark, one, path, 7L, assertNewDocs = true)
    assert(SearchProbe.scores(spark, path) ===
      Search.bm25(surviving.unionByName(one)).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("retraction survives a replayed batch: compaction retains tombstones above the watermark") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDir
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchreplay").toString + "/idx"
    val boot = docs.filter(col("doc_id") % 3 === 0)
    val b7 = docs.filter(col("doc_id") % 3 === 1)
    Search.writeSearchIndexFrom(spark, boot, path)
    Search.appendSearchIndexBatch(spark, b7, path, 7L)
    // retract one batch-7 doc that scores (so the hole is observable)
    val target = SearchProbe.scores(spark, path).map(_._1)
      .find(id => id % 3 == 1).getOrElse(b7.select("doc_id").collect()(0).getLong(0))
    Search.retractSearchDocs(spark, path, Seq(target))
    val surviving = boot.unionByName(b7).filter(col("doc_id") =!= target)
    def want(): Seq[(Long, Double, Long)] = Search.bm25(surviving).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(SearchProbe.scores(spark, path) === want())
    // compact with a watermark BELOW batch 7: batch 7 may still replay,
    // so the sidecar must ride through the swap
    Search.compactSearchIndex(spark, path, foldBelow = 5L)
    assert(new java.io.File(path + "/_tombstones").exists,
      "tombstones must be retained while a replayable batch remains")
    assert(SearchProbe.scores(spark, path) === want(), "scores unchanged by the fold")
    // THE resurrection case: batch 7 replays (at-least-once restart) and
    // re-inserts the retracted doc's rows verbatim — the retained
    // tombstone must keep it invisible and the scores exact
    Search.appendSearchIndexBatch(spark, b7, path, 7L)
    assert(SearchProbe.scores(spark, path) === want(),
      "a replayed batch must not resurrect a retracted doc")
    // once the watermark passes batch 7 nothing can replay: the final
    // fold purges rows, absorbs the stats correction, clears the sidecar
    Search.compactSearchIndex(spark, path, foldBelow = 8L)
    assert(!new java.io.File(path + "/_tombstones").exists)
    assert(spark.read.parquet(path).filter(col("doc_id") === target).count() === 0)
    assert(SearchProbe.scores(spark, path) === want())
    // a retraction REPLAYED after the purge finds no live rows and must
    // be a no-op — a blind tombstone here would silently swallow a doc
    // later admitted under the same id
    Search.retractSearchDocs(spark, path, Seq(target))
    assert(!new java.io.File(path + "/_tombstones").exists,
      "a post-purge retraction replay must not recreate the sidecar")
    // retracting a never-indexed id is equally a no-op
    Search.retractSearchDocs(spark, path, Seq(999999999L))
    assert(!new java.io.File(path + "/_tombstones").exists)
    assert(SearchProbe.scores(spark, path) === want())
  }

  test("as-of probe: latest equals the plain probe; retraction erases history; fold bounds the horizon") {
    import org.apache.spark.sql.functions.col
    val dir = TestSpark.sfDir
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft-searchasof").toString + "/idx"
    val boot = docs.filter(col("doc_id") % 10 =!= 5)
    val b7 = docs.filter(col("doc_id") % 10 === 5)
    Search.writeSearchIndexFrom(spark, boot, path)
    Search.appendSearchIndexBatch(spark, b7, path, 7L)
    def asOfScores(asOf: Long): Seq[(Long, Double, Long)] = {
      val hits = Search.probeSearchIndexAsOf(spark, path, Search.QueryTerms, asOf)
        .select("doc_id", "dl", "word", "tf")
      Search.scoreBm25(hits, Search.searchStatsAsOf(spark, path, asOf)).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    }
    def bm(corpus: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Long)] =
      Search.bm25(corpus).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // as of the newest batch = the plain probe = the full in-query scorer
    assert(asOfScores(7L) === SearchProbe.scores(spark, path))
    // as of before the append: scores equal the bootstrap corpus alone —
    // including the global stats (a stats leak from batch 7 would move
    // every score even where the postings slice is correct)
    assert(asOfScores(6L) === bm(boot),
      "pre-append as-of must reproduce the bootstrap scoring state exactly")
    // retraction erases history: a retracted bootstrap doc is invisible
    // (and its N/avgdl mass removed) at EVERY asOf
    val victim = SearchProbe.scores(spark, path)
      .map(_._1).find(id => id % 10 != 5).get
    Search.retractSearchDocs(spark, path, Seq(victim))
    assert(asOfScores(6L) === bm(boot.filter(col("doc_id") =!= victim)),
      "a retracted doc must not reappear in an as-of read")
    // ...while a doc retracted from batch 7 (after the asOf) must NOT
    // shrink the as-of stats — the correction derives from the as-of
    // membership, not the raw sidecar
    val lateVictim = b7.select("doc_id").orderBy("doc_id").limit(1)
      .collect()(0).getLong(0)
    Search.retractSearchDocs(spark, path, Seq(lateVictim))
    assert(asOfScores(6L) === bm(boot.filter(col("doc_id") =!= victim)),
      "retracting a post-asOf doc must leave the as-of state untouched")
    // the final fold absorbs batch 7: the horizon advances and a
    // pre-horizon read refuses loudly naming the oldest reconstructable state
    Search.compactSearchIndex(spark, path, foldBelow = 8L)
    val e = intercept[IllegalArgumentException](asOfScores(6L))
    assert(e.getMessage.contains("oldest reconstructable state is as of batch 7"),
      s"got: ${e.getMessage}")
    assert(asOfScores(7L) === SearchProbe.scores(spark, path),
      "the at-horizon as-of must survive the fold")
  }

  test("all-retracted index refuses stats loudly instead of null-propagating avgdl") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-searchempty").toString + "/idx"
    val two = Seq((1L, "alpha beta gamma"), (2L, "delta alpha")).toDF("doc_id", "text")
    Search.writeSearchIndexFrom(spark, two, path)
    Search.retractSearchDocs(spark, path, Seq(1L, 2L))
    // n_docs - tombstones = 0: avgdl is 0/0 — the old expression served a
    // silent null that turned every downstream BM25 score null/NaN
    val e = intercept[Exception] {
      Search.searchStats(spark, path).collect()
    }
    assert(e.getMessage.contains("every indexed document has been retracted"),
      s"got: ${e.getMessage}")
  }
}
