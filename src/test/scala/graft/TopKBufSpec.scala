package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{TopKBuf, TopKByScore}

/** Property battery for the k-capped heap behind `graft_topk`
  * (ScalarLibSpec's harness): the heap must equal a plain
  * sort-and-take reference under ANY input — including NaN, ±0.0, ±Inf
  * and duplicate scores — and must be insensitive to how rows are
  * split across partial buffers (merge) or serialized between them,
  * because Spark is free to partition, merge, and spill in any order.
  */
class TopKBufSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val score: Gen[Double] = Gen.frequency(
    (8, Gen.chooseNum(-1.0, 1.0)),
    (1, Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      0.0, -0.0, 0.5, -0.5)), // collision-prone specials exercise ties
  )
  /** Unique ids per list — the real domain (one row per candidate id
    * within a group); duplicate ids would make `better` a non-strict
    * order and the boundary cut genuinely ambiguous. */
  private val entries: Gen[List[(Double, Long)]] =
    Gen.listOf(score).map(_.zipWithIndex.map { case (s, i) => (s, i.toLong) })
  private val kGen: Gen[Int] = Gen.chooseNum(1, 6)

  /** Reference: full sort under the aggregate's own `better`, take k.
    * (better's total order is itself pinned against the WINDOW face in
    * SimilaritySpec — this spec only needs the heap ≡ sort law.) */
  private def reference(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortWith(TopKBuf.better).take(k)

  private def bitsOf(xs: Seq[(Double, Long)]): Seq[(Long, Long)] =
    xs.map { case (s, i) => (java.lang.Double.doubleToLongBits(s), i) }

  test("heap result equals sort-and-take for any input, any k") {
    check(Prop.forAll(entries, kGen) { (xs, k) =>
      val buf = new TopKBuf(k)
      xs.foreach { case (s, i) => buf.offer(s, i) }
      bitsOf(buf.sortedBestFirst.toSeq) == bitsOf(reference(xs, k))
    })
  }

  test("arbitrary partial-buffer splits merge to the single-buffer result") {
    val split = for {
      xs <- entries
      cut <- Gen.chooseNum(0, xs.length)
    } yield (xs, cut)
    check(Prop.forAll(split, kGen) { case ((xs, cut), k) =>
      val (a, b) = xs.splitAt(cut)
      val bufA = new TopKBuf(k)
      a.foreach { case (s, i) => bufA.offer(s, i) }
      val bufB = new TopKBuf(k)
      b.foreach { case (s, i) => bufB.offer(s, i) }
      bufB.entries.foreach { case (s, i) => bufA.offer(s, i) } // the merge path
      bitsOf(bufA.sortedBestFirst.toSeq) == bitsOf(reference(xs, k))
    })
  }

  test("serialize/deserialize round-trips the buffer exactly") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = TopKByScore(Literal(0.0), Literal(0L), Literal(3))
    check(Prop.forAll(entries) { xs =>
      val buf = new TopKBuf(3)
      xs.foreach { case (s, i) => buf.offer(s, i) }
      val back = agg.deserialize(agg.serialize(buf))
      bitsOf(back.sortedBestFirst.toSeq) == bitsOf(buf.sortedBestFirst.toSeq)
    })
  }
}
