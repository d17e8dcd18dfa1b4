package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Graph analytics over relationship edges derived from the relational
  * tables — the second graph-family member beside [[Dedup]]'s
  * large-star/small-star connected components (q_dedup_clusters).
  *
  * The reference has no graph operators (its only "graph" is the
  * batch_dependency DAG, walked row-at-a-time in
  * pkg_batch_util_body.sql:258-331); PageRank is a north-star extension —
  * the influence/centrality measure a curation pipeline uses to weight
  * link-graph-derived quality signals (the original web-scale use).
  *
  * Scale + determinism design:
  *  - **Fixed-point integer arithmetic.** Ranks are micro-units
  *    (1e6 = 1.0) held in BIGINT; per-edge contributions are integer
  *    floor divisions and the damping step is `(85 * Σ) div 100`. Integer
  *    addition is associative-commutative, so partition order, retries
  *    and AQE re-plans cannot wiggle a rank — the property that lets the
  *    DuckDB oracle replay the same unrolled iterations and hash-match
  *    exactly (the q_lm_score / bm25 fixed-point discipline applied to an
  *    iterative algorithm).
  *  - **One shuffle per iteration.** Each round is a keyed join of the
  *    (src-degreed) edge list against the current rank vector plus one
  *    dst-keyed aggregation — the textbook distributed formulation whose
  *    cost is O(|E|) per round at any scale. Iteration count is a fixed
  *    constant (power iteration, not convergence polling), so the plan is
  *    a static [[PrIters]]-deep DAG — no driver-side loop state, no
  *    collect anywhere.
  *  - The degreed edge list is persisted ONCE per run — every round
  *    joins the cached edges instead of recomputing the lineitem⋈orders
  *    derivation — and long iteration counts periodically truncate the
  *    rank lineage through the [[Checkpointer]] deployment seam (local
  *    blocks in dev, reliable DFS checkpoint on a cluster). At 100 TB
  *    the edge list would additionally be bucketed by `src`
  *    (Sinks.saveBucketed) so every round's join is co-located.
  */
object Graph {

  /** Power-iteration rounds. Fixed (not convergence-tested) so the plan
    * shape, the oracle SQL, and the sequential spec twin all agree on
    * exactly how many rounds ran. */
  private[graft] val PrIters = 3

  /** Initial rank in micro-units (1.0 per node — the uniform start). */
  private[graft] val PrInit = 1000000L

  /** Undirected customer↔supplier edges: customer `c` bought from
    * supplier `s` somewhere in lineitem. Node ids interleave the two key
    * spaces (customer 2k, supplier 2k+1) so one BIGINT column addresses
    * both sides. DISTINCT first — multiplicity is not adjacency. */
  private[graft] def custSuppEdges(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).cast("bigint").as("src"),
        (col("l_suppkey") * 2 + 1).cast("bigint").as("dst"))
      .distinct()
  }

  /** PageRank over an arbitrary directed edge frame (src, dst) — both
    * directions of an undirected graph are the caller's two rows. The
    * update is the standard damped form in micro-units:
    * `r' = 150000 + (85 * Σ_in (r_src div deg_src)) div 100`. Nodes
    * outside the edge list don't exist; a node with edges always has
    * in-edges under an undirected edge set, so no rank mass silently
    * vanishes into dangling nodes. */
  private[graft] def pagerank(edges: DataFrame, iters: Int = PrIters): DataFrame = {
    val cp = Checkpointer.fromConf(edges.sparkSession)
    val (rank, edgesDeg, lastCk) = pagerankLazy(edges, iters, cp)
    // Materialize the final round through the checkpoint seam, THEN drop
    // every intermediate store: the returned frame reads its own
    // checkpoint (Local: block storage released by the context cleaner
    // once the frame is garbage — NOT a CacheManager entry), so nothing
    // re-reads edgesDeg or the mid-chain checkpoint after this point.
    val out = cp(rank)
    lastCk.foreach(cp.release)
    edgesDeg.unpersist(blocking = false)
    out
  }

  /** The lazy iteration, pre-materialization — exposed so PlanSpec can
    * assert the per-round plan shape (every round reads the CACHED
    * degreed edges, never their lineage), which the public entry hides
    * behind its final checkpoint. Callers own the cleanup the public
    * entry performs: unpersist `edgesDeg`, release the `lastCk`
    * checkpoint. Returns (final-round rank, edgesDeg, last mid-chain
    * checkpoint). */
  private[graft] def pagerankLazy(edges: DataFrame, iters: Int,
      cp: Checkpointer): (DataFrame, DataFrame, Option[DataFrame]) = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
    // The degreed edge list appears in EVERY round's join; left lazy it
    // rides the final DAG `iters` times and is recomputed per round
    // (lineage × iterations — the iterative-algorithm scale-killer).
    // persist(), not checkpoint: the first round's own tasks populate
    // the cache in-job (no separate materialization job), rounds 2..N
    // read blocks, and lineage stays intact so an executor loss
    // recomputes instead of failing — the right trade for a REUSED
    // frame, vs the rank chain below where the problem is lineage DEPTH
    // and truncation (the Checkpointer seam) is the point. persist()
    // registers the plan in the session CacheManager, which holds a
    // strong reference until an explicit unpersist — so the final round
    // below materializes the result and unpersists this frame before
    // returning (a leaked entry would pin MEMORY_AND_DISK blocks for
    // the session's lifetime on every call).
    val edgesDeg = edges.join(deg, "src").persist()
    // seed from the CACHED frame, not deg's own lineage — deg re-derives
    // the full edge list (at 100 TB, a second corpus-scale derivation
    // for a node-id list); the cached join carries the same src set
    var rank = edgesDeg.select(col("src").as("node")).distinct()
      .select(col("node"), lit(PrInit).as("r"))
    var lastCk: Option[DataFrame] = None
    (1 to iters).foreach { i =>
      rank = edgesDeg.join(rank.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), expr("r div d").as("c"))
        .groupBy("node")
        .agg((lit(150000L) + expr("(85 * sum(c)) div 100")).as("r"))
      // Long power iterations (the 20+ rounds real PageRank runs) also
      // need the RANK lineage truncated periodically, or round N's plan
      // nests N joins deep; a no-op at PrIters=3. Integer arithmetic
      // makes the truncation value-invariant.
      if (i % RankCheckpointEvery == 0 && i < iters) {
        val ck = cp(rank)
        lastCk.foreach(cp.release)
        lastCk = Some(ck)
        rank = ck
      }
    }
    (rank, edgesDeg, lastCk)
  }

  /** Truncate the rank lineage every this many rounds (see above). */
  private[graft] val RankCheckpointEvery = 10

  /** The distinct customer↔supplier edge list, materialized ONCE per
    * (JVM, dataset dir) as a tmp parquet store — the stored-index
    * amortization every ANN/signature face already uses
    * ([[graft.sources.TmpStores.buildOnce]], r20 verdict item 2a): the
    * corpus-scale lineitem⋈orders join + distinct is identical for every
    * graph query over one corpus, so the first caller pays the build
    * (logged separately by buildOnce) and every later rep/consumer reads
    * the node-scale edge parquet instead of re-deriving. At 100 TB this
    * is the difference between one corpus pass per analytics run and one
    * per query. */
  private[graft] def custSuppEdgesStored(s: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.TmpStores.scopedPath("graft-gredge", dir)
    graft.sources.TmpStores.buildOnce(path)(
      custSuppEdges(s, dir).write.parquet(path))
    s.read.parquet(path)
  }

  /** Registered face: PageRank centrality of every customer and supplier
    * in the purchase graph, [[PrIters]] exact-integer rounds.
    *
    * The edge DERIVATION reads the [[custSuppEdgesStored]] parquet (r21,
    * replacing the r21-batch-1 per-query checkpoint): left lazy, the
    * lineitem⋈orders join + distinct rode the materialization DAG four
    * times (the union doubles it; edgesDeg's degree aggregate and degree
    * join double it again); the checkpoint cut that to one derivation
    * per call, and the stored edge list cuts it to one per corpus — the
    * union/degree consumers re-scan a node-scale columnar file, which
    * needs no checkpoint. */
  def qPagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = custSuppEdgesStored(s, dir)
    val und = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val ranked = pagerank(und)
    ranked
      .select(col("node"),
        when(pmod(col("node"), lit(2L)) === 0, lit("customer"))
          .otherwise(lit("supplier")).as("node_type"),
        col("r").as("rank_micro"))
      .orderBy("node")
  }

  // ---- triangle counting --------------------------------------------------

  /** Minimum co-occurrence support for a co-purchase edge: parts must
    * share ≥ this many DISTINCT orders. Support 1 on this corpus is a
    * one-off-coincidence graph (115k edges at sf0.01); support 2 is the
    * frequent-itemset flavor a basket analysis actually draws (3.4k
    * edges, 61 triangles) — and on any corpus the threshold is the knob
    * that keeps edge volume proportional to REPEATED structure, not to
    * corpus size. */
  private[graft] val CoSupport = 2

  /** Undirected co-purchase edges (a < b): parts appearing together in
    * ≥ [[CoSupport]] distinct orders. The per-order self-join fans out
    * at most lines-per-order² rows per order — bounded by the schema's
    * order size, never corpus-quadratic — and the support aggregate
    * shuffles on the high-cardinality pair key. */
  private[graft] def partCoEdges(s: SparkSession, dir: String): DataFrame = {
    // distinct (order, part) FIRST: a part ordered on two lines of one
    // order must count one co-occurrence, and deduplicating before the
    // self-join both fixes that semantics and turns the support
    // aggregate into a plain count (a countDistinct after the join
    // would carry an expand + second distinct pass over the pair rows —
    // measurably slower on the same answer)
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_partkey").distinct()
    li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey").as("ok2"), col("l_partkey").as("b")),
        col("l_orderkey") === col("ok2") && col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= CoSupport)
      .select(col("a").cast("bigint").as("a"), col("b").cast("bigint").as("b"))
  }

  /** Per-node triangle counts of an undirected (a < b, distinct) edge
    * frame — the degree-ORIENTED algorithm (Suri & Vassilvitskii 2011,
    * "Counting Triangles and the Curse of the Last Reducer"): every
    * edge is directed from its lower-(degree, id) endpoint to the
    * higher, making the orientation a total order, so each triangle has
    * EXACTLY one node with two out-edges (counted once, no /3
    * correction) and — the scale point — wedge volume is Σ out-deg(u)²
    * with out-degrees bounded by O(√m) under this orientation, instead
    * of the Σ deg² of the naive formulation that a single hub node
    * drives quadratic (the "last reducer" the paper names). Three
    * equi-joins on high-cardinality keys; no driver-side state. */
  /** The degree ORIENTATION, lazy (PlanSpec pins this plan): every edge
    * directed from its lower-(degree, id) endpoint to the higher. */
  private[graft] def orientedEdges(edges: DataFrame): DataFrame = {
    val deg = edges.select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // rank = (degree, id) struct — totally ordered, comparable in-plan
    // (struct fields named uniformly so the two CASE branches type-match)
    val ra = struct(col("da").as("d"), col("a").as("i"))
    val rb = struct(col("db").as("d"), col("b").as("i"))
    edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(ra < rb, col("a")).otherwise(col("b")).as("u"),
        when(ra < rb, col("b")).otherwise(col("a")).as("v"),
        when(ra < rb, rb).otherwise(ra).as("rv"))
  }

  /** Wedge generation + closure + per-node counts over an oriented edge
    * frame, lazy (PlanSpec pins the equi-join shape). */
  private[graft] def wedgeClose(e: DataFrame): DataFrame = {
    // wedges at u, ordered by the far endpoints' ranks so the closing
    // edge's orientation (lower rank → higher rank) is known statically
    val tris = e.select(col("u"), col("v").as("p"), col("rv").as("rp"))
      .join(e.select(col("u").as("u2"), col("v").as("q"), col("rv").as("rq")),
        col("u") === col("u2") && col("rp") < col("rq"))
      .join(e.select(col("u").as("cu"), col("v").as("cv")),
        col("p") === col("cu") && col("q") === col("cv"), "left_semi")
      .select(col("u"), col("p"), col("q"))
    tris.select(explode(array(col("u"), col("p"), col("q"))).as("l_partkey"))
      .groupBy("l_partkey")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Checkpointed composition: the input edge list feeds the degree
    * aggregate AND the two orientation joins (callers pass a
    * MATERIALIZED edge frame — a stored parquet or a spec's local
    * relation — so those three scans are cheap re-reads, not re-derived
    * lineage), and the oriented frame feeds BOTH wedge sides plus the
    * closure semi-join — left lazy, the orientation rides the DAG once
    * per reference (the three wedge/closure exchanges differ in
    * projected columns, so runtime exchange reuse cannot dedup them).
    * The oriented stage materializes once through the [[Checkpointer]]
    * seam and is released as soon as the wedge stage has materialized —
    * the [[pagerankLazy]] discipline. */
  private[graft] def triangleCounts(edges: DataFrame): DataFrame = {
    val cp = Checkpointer.fromConf(edges.sparkSession)
    val e = cp(orientedEdges(edges))
    val out = cp(wedgeClose(e))
    cp.release(e)
    out.orderBy(col("n_triangles").desc, col("l_partkey"))
  }

  /** The co-purchase edge list, materialized once per (JVM, dataset dir)
    * — [[custSuppEdgesStored]]'s rationale: the per-order self-join +
    * support aggregate is the expensive corpus-scale part of
    * q_triangles (25 MB of the query's 25 MB shuffle at sf0.1), and it
    * is a pure function of the corpus. */
  private[graft] def partCoEdgesStored(s: SparkSession, dir: String): DataFrame = {
    val path = graft.sources.TmpStores.scopedPath("graft-gcoedge", dir)
    graft.sources.TmpStores.buildOnce(path)(
      partCoEdges(s, dir).write.parquet(path))
    s.read.parquet(path)
  }

  /** Registered face: per-part triangle participation in the
    * co-purchase graph — the local-clustering signal basket analyses
    * and community pre-passes start from. */
  def qTriangles(s: SparkSession, dir: String): DataFrame =
    triangleCounts(partCoEdgesStored(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pagerank" -> qPagerank _,
    "q_triangles" -> qTriangles _,
  )

  /** The oracle unrolls the same [[PrIters]] integer rounds as CTEs.
    * DuckDB's `//` is floor division and Spark's `div` truncates toward
    * zero — identical on the all-nonnegative values here; the HUGEINT
    * that DuckDB's BIGINT sum() widens to is cast back down so both
    * engines hash BIGINT ranks. */
  val oracles: Map[String, String] = {
    val base =
      """WITH e0 AS (
        |  SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |deg AS (SELECT src AS node, count(*) AS d FROM und GROUP BY 1),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)""".stripMargin
    val iters = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT u.dst AS node,
         |    CAST(150000 + (85 * sum(p.r // deg.d)) // 100 AS BIGINT) AS r
         |  FROM und u
         |  JOIN r${i - 1} p ON u.src = p.node
         |  JOIN deg ON u.src = deg.node
         |  GROUP BY u.dst)""".stripMargin
    }.mkString(",\n")
    Map(
      "q_pagerank" ->
        s"""$base,
           |$iters
           |SELECT node,
           |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
           |  r AS rank_micro
           |FROM r$PrIters ORDER BY node""".stripMargin,
      // the oracle enumerates triangles the textbook way (a < b < c over
      // the undirected edge set) — each triangle once, no orientation —
      // so it discriminates against any over/under-count the
      // degree-oriented plan could introduce
      "q_triangles" ->
        s"""WITH pairs AS (
           |  SELECT l1.l_partkey AS a, l2.l_partkey AS b, l1.l_orderkey
           |  FROM lineitem l1 JOIN lineitem l2
           |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey),
           |e AS (
           |  SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b
           |  FROM pairs GROUP BY 1, 2
           |  HAVING count(DISTINCT l_orderkey) >= $CoSupport),
           |t AS (
           |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM e e1
           |  JOIN e e2 ON e1.b = e2.a
           |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
           |n AS (
           |  SELECT x AS l_partkey FROM t
           |  UNION ALL SELECT y FROM t
           |  UNION ALL SELECT z FROM t)
           |SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_triangles
           |FROM n GROUP BY 1
           |ORDER BY n_triangles DESC, l_partkey""".stripMargin,
    )
  }
}
