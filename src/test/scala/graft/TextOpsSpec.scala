package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Structural invariants of the chunking and sampling operators (their
  * values are hash-verified against DuckDB oracles by the driver gate).
  */
class TextOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  test("chunks tile every document: full coverage, bounded size, correct overlap") {
    val chunks = TextOps.qTextChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val nWords = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        size(split(trim(regexp_replace(regexp_replace(lower(col("text")), "[^a-z ]", ""), " +", " ")), " "))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (docId, rows) =>
      val sorted = rows.sortBy(_._2)
      // indexes are 0,1,2,... and starts advance by exactly the stride
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == idx * 80 + 1, s"doc $docId chunk $idx starts at $start")
        assert(len >= 1 && len <= 100)
      }
      // full coverage: last chunk must reach the document's final word
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen - 1 == nWords(docId),
        s"doc $docId: chunks end at ${lastStart + lastLen - 1} of ${nWords(docId)} words")
      // every non-first chunk overlaps its predecessor by 20 words
      sorted.toSeq.sliding(2).foreach { pair =>
        if (pair.size == 2) {
          val (_, _, s1, l1) = pair(0)
          val (_, _, s2, _) = pair(1)
          assert(s2 == s1 + 80 && s1 + l1 - s2 >= 0)
        }
      }
    }
  }

  test("stratified sampling keeps deterministic per-language fractions") {
    val rows = TextOps.qStratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, total, kept) =>
      assert(kept >= 0 && kept <= total, s"$lang: $kept of $total")
    }
    // the en stratum must actually downsample (threshold 0x29 ≈ 16%)
    rows.find(_._1 == "en").foreach { case (_, total, kept) =>
      assert(kept < total, "en must be downsampled")
    }
    // rerun → identical decisions (content-hash, no RNG)
    val again = TextOps.qStratifiedSample(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }
}
