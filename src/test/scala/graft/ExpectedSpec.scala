package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.verify.Expected

/** The differential twins in [[graft.verify.Expected]] pinned against the
  * engine BIT-FOR-BIT on sf0.001: the driver's DuckDB pass compares the
  * engine's parquet against the twin-generated expected parquet, so a twin
  * that drifted from the engine would turn the CORRECTNESS rows red — this
  * suite catches the drift at test time, on either side's change.
  */
class ExpectedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private lazy val docs: Seq[(Long, String)] =
    graft.sources.Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
  private lazy val embs: Seq[(Long, Array[Float])] =
    graft.sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq

  test("minhash twin equals the engine's banded self-join row-for-row") {
    val expected = Expected.minhashRows(docs)
    val got = Dedup.qDedupMinhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(expected.nonEmpty, "sf0.001 must yield minhash candidate pairs")
    assert(got === expected)
  }

  test("simhash twin equals the engine's banded self-join row-for-row") {
    val expected = Expected.simhashRows(docs)
    val got = Dedup.qDedupSimhash(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(expected.nonEmpty, "sf0.001 must yield simhash near-dup pairs")
    assert(got === expected)
  }

  test("IVF twin equals the engine's in-query IVF bit-for-bit (doubles by bits)") {
    val expected = Expected.ivfRows(embs)
      .map { case (q, r, n, c) => (q, r, n, java.lang.Double.doubleToLongBits(c)) }
    val got = Similarity.qAnnIvf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("PQ twin equals the engine's ADC scan bit-for-bit (doubles by bits)") {
    val expected = Expected.pqRows(embs)
      .map { case (q, r, n, c) => (q, r, n, java.lang.Double.doubleToLongBits(c)) }
    val got = Similarity.qAnnPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("IVF-PQ twin equals the engine's composed scan bit-for-bit (doubles by bits)") {
    val expected = Expected.ivfPqRows(embs)
      .map { case (q, r, n, c) => (q, r, n, java.lang.Double.doubleToLongBits(c)) }
    val got = Similarity.qIvfPq(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("semantic-dedup twin equals the engine bit-for-bit (doubles by bits)") {
    val expected = Expected.semanticRows(embs)
      .map { case (d, k, l, c) => (d, k, l, java.lang.Double.doubleToLongBits(c)) }
    val got = Similarity.qDedupSemantic(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSeq
    assert(expected.nonEmpty, "sf0.001 must yield semantic-dedup drops")
    assert(got === expected)
  }

  test("k-means twin equals the engine's cluster profile bit-for-bit") {
    val expected = Expected.kmeansRows(embs)
      .map { case (c, n, m) => (c, n, java.lang.Double.doubleToLongBits(m)) }
    val got = Similarity.qKmeans(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2)))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("cluster-sample twin equals the engine's balanced draw row-for-row") {
    val expected = Expected.clusterSampleRows(embs)
    val got = Similarity.qClusterSample(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
    // balance: every non-empty cluster contributes at most K, and a
    // cluster with >= K members contributes exactly K
    val profile = Similarity.qKmeans(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val drawn = got.groupBy(_._1).view.mapValues(_.size).toMap
    drawn.foreach { case (c, n) =>
      assert(n === math.min(profile(c), Similarity.ClusterSampleK.toLong))
    }
  }

  test("image near-dup twin equals the engine's banded dHash join row-for-row") {
    val expected = Expected.imageNeardupRows(docs)
    val got = graft.operators.Multimodal.qImageNeardup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue)).toSeq
    assert(expected.nonEmpty, "sf0.001 must yield perceptual near-dup pairs")
    assert(got === expected)
  }

  test("BPE twin equals the engine's q_token_bpe bit-for-bit (doubles by bits)") {
    val expected = Expected.bpeRows(docs).map { case (id, w, ch, t, cpt) =>
      (id, w, ch, t, cpt.map(java.lang.Double.doubleToLongBits))
    }
    val got = graft.operators.TextOps.qTokenBpe(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(java.lang.Double.doubleToLongBits(r.getDouble(4)))))
      .toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("compress-ratio twin equals the engine bit-for-bit (doubles by bits)") {
    val expected = Expected.compressRows(docs).map { case (id, nb, dl, r, f) =>
      (id, nb, dl, r.map(java.lang.Double.doubleToLongBits), f)
    }
    val got = graft.operators.TextOps.qCompressRatio(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(java.lang.Double.doubleToLongBits(r.getDouble(3))),
        r.getInt(4))).toSeq
    assert(expected.nonEmpty)
    assert(got === expected)
  }

  test("round6 twin matches Spark's round(_, 6) on doubles incl. NaN/Inf/ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val vals = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, 0.1234565, -0.1234565, 0.12345649999, 1e-30, -1e-30) ++
      Seq.fill(200)(rnd.nextDouble() * 2 - 1)
    val sparkRounded = vals.toDF("x").select(round(col("x"), 6)).collect().map(_.getDouble(0))
    vals.zip(sparkRounded).foreach { case (x, s) =>
      assert(java.lang.Double.doubleToLongBits(Expected.round6(x)) ===
        java.lang.Double.doubleToLongBits(s), s"round6($x)")
    }
  }
}
