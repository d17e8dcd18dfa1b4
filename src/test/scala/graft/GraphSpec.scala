package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank (operators/Graph): the distributed fixed-point iteration must
  * equal a sequential driver-side fold of the same integer update — the
  * determinism contract that lets the DuckDB oracle replay it. */
class GraphSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  /** Sequential reference: the same damped integer update, computed in a
    * driver loop over an adjacency map. */
  private def seqPagerank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val bySrc = edges.groupBy(_._1)
    val deg = bySrc.map { case (n, es) => n -> es.size.toLong }
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    (1 to iters).foreach { _ =>
      val recv = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (src, dst) => recv(dst) += rank(src) / deg(src) }
      rank = recv.map { case (n, sum) => n -> (150000L + 85L * sum / 100L) }.toMap
    }
    rank
  }

  test("pagerank equals the sequential integer fold on a hand graph") {
    // path + hub: 1—2, 2—3, 2—4 (undirected)
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (2L, 4L), (4L, 2L))
    val got = Graph.pagerank(und.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === seqPagerank(und, 3))
    // the hub (node 2) must out-rank the leaves
    assert(got(2L) > got(1L) && got(2L) > got(3L) && got(2L) > got(4L))
  }

  test("q_pagerank covers every connected node exactly once, typed by key space") {
    val df = Graph.qPagerank(s, TestSpark.sfDir)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    assert(rows.forall(r =>
      (r.getLong(0) % 2 == 0) == (r.getString(1) == "customer")))
    // both node types participate and every rank carries the damping floor
    assert(rows.exists(_.getString(1) == "customer"))
    assert(rows.exists(_.getString(1) == "supplier"))
    assert(rows.forall(_.getLong(2) >= 150000L))
  }

  test("deep iteration drives the rank-lineage checkpoint path") {
    // 12 > RankCheckpointEvery (10): round 10 truncates the rank chain
    // through the Checkpointer and round 12's final materialization must
    // release the mid-chain checkpoint — the code path a 20+-round
    // production run lives on, a no-op at the registered PrIters
    assert(Graph.RankCheckpointEvery <= 10,
      "test assumes the checkpoint seam fires within 12 rounds")
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (2L, 4L), (4L, 2L),
      (3L, 4L), (4L, 3L))
    val got = Graph.pagerank(und.toDF("src", "dst"), iters = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === seqPagerank(und, 12))
  }

  test("pagerank leaves no cache entry behind (CacheManager hygiene)") {
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    s.catalog.clearCache()
    val out = Graph.pagerank(und.toDF("src", "dst"))
    out.count()
    // the internal edgesDeg persist() must be unpersisted before return:
    // a leaked CacheManager entry would pin blocks for the session's
    // lifetime on every call. cacheManager is private[sql] (public at
    // bytecode level) — reflection, same pattern Bench uses for the
    // listener bus.
    val ss = s.sharedState
    val cm = ss.getClass.getMethods.find(_.getName == "cacheManager")
      .map(_.invoke(ss)).get
    val empty = cm.getClass.getMethods.find(_.getName == "isEmpty")
      .map(_.invoke(cm).asInstanceOf[Boolean]).get
    assert(empty, "pagerank must unpersist its internal edge cache before returning")
  }

  test("triangle counts: planted K4, hub star contributes nothing, partitioning-invariant") {
    // K4 on {1,2,3,4}: 4 triangles, each node on exactly 3 of them; a
    // path 5—6—7 (wedge, no closure); a hub 100 fanning to 20 leaves —
    // the degree orientation's raison d'être: all hub edges point INTO
    // the hub (its rank is highest), so the hub generates ZERO wedges
    // and the star adds nothing to the join, not deg² candidate pairs
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val path = Seq((5L, 6L), (6L, 7L))
    val star = (1L to 20L).map(i => (200L + i, 1000L)) // a < b holds
    val edges = (k4 ++ path ++ star).toDF("a", "b")
    val want = (1L to 4L).map(n => n -> 3L).toMap
    Seq(edges, edges.repartition(7), edges.repartition(1)).foreach { e =>
      val got = Graph.triangleCounts(e).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === want,
        "exactly the K4 nodes carry triangles, 3 each (4 distinct triangles)")
    }
  }

  test("pagerank is invariant to edge-list partitioning") {
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L), (3L, 1L))
    val one = Graph.pagerank(und.toDF("src", "dst").repartition(1))
      .orderBy("node").collect().toSeq
    val many = Graph.pagerank(und.toDF("src", "dst").repartition(7, col("dst")))
      .orderBy("node").collect().toSeq
    assert(one === many)
  }
}
