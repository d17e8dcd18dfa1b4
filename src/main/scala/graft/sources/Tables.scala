package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single code path for every scan the engine performs.
  *
  * The reference anchors all of its SQL to statically-known schemas via
  * `%ROWTYPE` / `%TYPE` (pkg_batch_util_spec.sql:20-22); the Spark analogue is
  * a shared loader whose schema comes from the parquet footer, so every
  * operator sees the same columns and Catalyst can push filters/projections
  * into the scan (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * At 100 TB these paths would be partitioned directories (e.g. by date);
  * `spark.read.parquet` handles partition pruning transparently, so operators
  * written against these loaders survive the scale-up unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
