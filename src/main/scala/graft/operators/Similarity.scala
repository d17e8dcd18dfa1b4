package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over the `embeddings` table (`embedding: array<float>`,
  * 64-dim) — north-star extensions, SURVEY §7.6.
  *
  * Three tiers:
  *  - `qEmbedNeardup`: blocked pairwise cosine (near-dup detection);
  *  - `qAnnTopk`: brute-force cosine top-k — the exact baseline. The query
  *    set is broadcast, so the corpus is scanned once with no shuffle and
  *    the per-query top-k is a TakeOrdered-style window; at 100 TB this is
  *    the classic "small query batch × huge corpus" scan shape.
  *  - `qAnnLsh`: random-hyperplane LSH buckets — the scale path. Each
  *    vector maps to a small bucket id; search touches only the probed
  *    bucket (corpus pre-partitionable by bucket at write time, so a query
  *    reads ~1/2^bits of the data). Verified for recall against the
  *    brute-force tier in SimilaritySpec, not by SQL oracle.
  *
  * All dot products run as codegen'd higher-order functions over the float
  * array, accumulated in double, sequentially — bit-identical to the
  * DuckDB oracle's list arithmetic, which is what makes differential
  * testing of float math possible at all.
  */
object Similarity {

  /** Sequential-fold dot product of two float vectors in double precision. */
  private def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0 as double), (acc, v) -> acc + v)")

  private def norm(a: String): Column = sqrt(dot(a, a))

  private def withNorm(df: DataFrame): DataFrame =
    df.withColumn("nrm", norm("embedding"))

  // ---- cosine near-dup pairs, blocked by label --------------------------
  // (The synthetic corpus has no planted high-cosine dup clusters — max
  // pairwise cosine ≈ 0.51 — so the demo threshold is 0.4; the operator
  // shape is what matters: block → pair within block → threshold.)
  def qEmbedNeardup(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val a = e.select(col("vec_id").as("id_a"), col("label"),
      col("embedding").as("emb_a"), col("nrm").as("nrm_a"))
    val b = e.select(col("vec_id").as("id_b"), col("label"),
      col("embedding").as("emb_b"), col("nrm").as("nrm_b"))
    a.join(b, Seq("label")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(dot("emb_a", "emb_b") / (col("nrm_a") * col("nrm_b")), 6))
      .filter(col("cosine") >= 0.4)
      .select("label", "id_a", "id_b", "cosine")
      .orderBy("label", "id_a", "id_b")
  }

  // ---- brute-force cosine top-k -----------------------------------------
  /** Top-5 neighbors for each query vector (vec_id ≡ 0 mod 100). Ranking
    * uses the ROUNDED cosine with vec_id tiebreak so ordering is identical
    * across engines even at float-tie boundaries.
    */
  def qAnnTopk(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir))
    val queries = e.filter(pmod(col("vec_id"), lit(100L)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val scored = corpus.crossJoin(broadcast(queries))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", round(dot("q_emb", "n_emb") / (col("q_nrm") * col("n_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("n_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  // ---- LSH-bucketed ANN (Spark-native scale path) -----------------------
  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * uniform in [-0.5, 0.5), derived from a 64-bit avalanche hash so no
    * RNG state is needed (reproducible across executors by construction).
    */
  private def planeComponent(plane: Int, dim: Int): Double = {
    var h = (plane.toLong << 32) | (dim.toLong & 0xFFFFFFFFL)
    h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL
    h ^= h >>> 33; h *= 0xC4CEB9FE1A85EC53L
    h ^= h >>> 33
    (h >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  private val NumPlanes = 8
  private val Dim = 64

  /** Sign-bucket of a vector under the fixed hyperplane family. */
  def lshBucket(embedding: Column): Column = {
    val bits = (0 until NumPlanes).map { p =>
      val proj = expr(
        s"aggregate(zip_with(embedding, ${planeExpr(p)}, (x, y) -> cast(x as double) * y), " +
          "cast(0 as double), (acc, v) -> acc + v)")
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  private def planeExpr(p: Int): String =
    (0 until Dim).map(d => planeComponent(p, d).toString).mkString("array(", ", ", ")")

  /** ANN via single-probe LSH: each query searches only its own sign
    * bucket (expected corpus fraction 1/2^8). Returns the same schema as
    * qAnnTopk minus the exactness guarantee; SimilaritySpec measures
    * recall against the brute-force baseline.
    */
  def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(s, dir)).withColumn("bucket", lshBucket(col("embedding")))
    val queries = e.filter(pmod(col("vec_id"), lit(100L)) === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket"))
    val corpus = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      col("nrm").as("n_nrm"), col("bucket"))
    val scored = corpus.join(broadcast(queries), Seq("bucket"))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cosine", round(dot("q_emb", "n_emb") / (col("q_nrm") * col("n_nrm")), 6))
    val w = Window.partitionBy("q_id").orderBy(col("cosine").desc, col("n_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("bigint").as("rank"), col("n_id").as("neighbor_id"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_neardup" -> qEmbedNeardup _,
    "q_ann_topk"      -> qAnnTopk _,
    "q_ann_lsh"       -> qAnnLsh _,
  )

  /** q_ann_lsh has no SQL oracle (approximate by design) — rows-only check
    * for the driver; recall vs q_ann_topk asserted in SimilaritySpec. */
  val oracles: Map[String, String] = Map(
    "q_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt(list_aggregate(list_transform(range(1, length(embedding) + 1),
        |      i -> cast(embedding[i] AS double) * cast(embedding[i] AS double)), 'sum')) AS nrm
        |  FROM embeddings)
        |SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_aggregate(list_transform(range(1, length(a.embedding) + 1),
        |      i -> cast(a.embedding[i] AS double) * cast(b.embedding[i] AS double)), 'sum')
        |    / (a.nrm * b.nrm), 6) AS cosine
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE round(list_aggregate(list_transform(range(1, length(a.embedding) + 1),
        |      i -> cast(a.embedding[i] AS double) * cast(b.embedding[i] AS double)), 'sum')
        |    / (a.nrm * b.nrm), 6) >= 0.4
        |ORDER BY 1, 2, 3""".stripMargin,
    "q_ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, embedding,
        |    sqrt(list_aggregate(list_transform(range(1, length(embedding) + 1),
        |      i -> cast(embedding[i] AS double) * cast(embedding[i] AS double)), 'sum')) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id % 100 = 0),
        |scored AS (
        |  SELECT q.q_id, e.vec_id AS neighbor_id,
        |    round(list_aggregate(list_transform(range(1, length(q.q_emb) + 1),
        |        i -> cast(q.q_emb[i] AS double) * cast(e.embedding[i] AS double)), 'sum')
        |      / (q.q_nrm * e.nrm), 6) AS cosine
        |  FROM q, e WHERE e.vec_id <> q.q_id)
        |SELECT q_id, rank, neighbor_id, cosine FROM (
        |  SELECT q_id, neighbor_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS rank
        |  FROM scored) t
        |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin,
  )
}
