package graft

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MgBuf

/** Property battery for the Misra-Gries buffer behind `graft_mg`
  * (TopKBufSpec's harness). The load-bearing law is the candidate
  * guarantee: under ANY partitioning of the stream and ANY merge-tree
  * shape over the partial buffers, every item whose true frequency
  * exceeds n/(k+1) must survive with a positive counter, and every held
  * counter must be a lower bound within n/(k+1) of the true count —
  * that pair is exactly what makes qHeavyHitters' two-pass recount
  * exact and partitioning-independent.
  */
class MgBufSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** Skewed vocabulary so heavy hitters actually exist: two hot words
    * dominate, a long tail of cold ones collides with the capacity. */
  private val word: Gen[String] = Gen.frequency(
    (8, Gen.const("hot")),
    (5, Gen.const("warm")),
    (7, Gen.chooseNum(0, 40).map(i => s"w$i")))
  private val stream: Gen[List[String]] = Gen.listOf(word)
  private val kGen: Gen[Int] = Gen.chooseNum(2, 8)
  private val seedGen: Gen[Long] = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  /** Fold a random chunking of `xs` into buffers, then merge them in a
    * random binary-tree order — the degrees of freedom Spark exercises
    * via partitioning, partial aggregation, and merge scheduling. */
  private def mgOf(xs: List[String], k: Int, seed: Long): MgBuf = {
    val rnd = new Random(seed)
    val chunks = scala.collection.mutable.ListBuffer(List.empty[String])
    xs.foreach { w =>
      if (rnd.nextInt(4) == 0) chunks += List(w)
      else chunks(chunks.size - 1) = w :: chunks(chunks.size - 1)
    }
    var bufs = chunks.toList.map { c =>
      val b = new MgBuf(k); c.foreach(b.offer); b
    }
    while (bufs.size > 1) {
      val i = rnd.nextInt(bufs.size - 1)
      bufs(i).absorb(bufs(i + 1))
      bufs = bufs.patch(i + 1, Nil, 1)
    }
    bufs.head
  }

  test("guarantee: items above n/(k+1) survive any chunking and merge tree") {
    check(Prop.forAll(stream, kGen, seedGen) { (xs, k, seed) =>
      val buf = mgOf(xs, k, seed)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val floor = xs.size.toDouble / (k + 1)
      val held = buf.sorted.toMap
      Prop.all(
        Prop(truth.forall { case (w, c) =>
          c <= floor || held.contains(w)
        }) :| s"above-floor item missing (floor $floor, held ${held.keySet})",
        Prop(held.forall { case (w, c) =>
          val t = truth.getOrElse(w, 0L)
          c <= t && t - c <= floor
        }) :| "held counts must be lower bounds within n/(k+1)",
        Prop(held.size <= k) :| "capacity must bound the buffer")
    })
  }

  test("single-buffer stream is exact while under capacity") {
    check(Prop.forAll(stream, seedGen) { (xs, seed) =>
      val k = xs.distinct.size + 1 // never evicts
      val buf = mgOf(xs, k, seed)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      Prop(buf.sorted.toMap == truth) :| "under capacity MG is an exact counter"
    })
  }

  test("sorted rendering is deterministic: count desc, word asc") {
    val b = new MgBuf(8)
    List("b", "a", "a", "c", "b", "a", "c").foreach(b.offer)
    assert(b.sorted.toSeq === Seq(("a", 3L), ("b", 2L), ("c", 2L)))
  }

  test("aggregate buffer serialization survives words past writeUTF's 64 KB cap") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    // an unbroken 100k-char token (web junk survives normText intact) plus
    // a multi-byte word: the shuffle round-trip must hold both verbatim
    val agg = graft.functions.MgFrequentItems(Literal("x"), Literal(4))
    val b = agg.createAggregationBuffer()
    val huge = "z" * 100000
    Seq(huge, huge, "été", "a").foreach(b.offer)
    val back = agg.deserialize(agg.serialize(b))
    assert(back.sorted.toSeq === b.sorted.toSeq)
    assert(back.sorted.toMap.get(huge) === Some(2L))
  }
}
