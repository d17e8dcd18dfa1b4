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

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(all.contains(name), s"unknown table '$name'; known: ${all.mkString(", ")}")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** events.parquet's `ts` physical type has varied across driver data
    * generations — INT64 TIMESTAMP(NANOS) (which Spark 4 rejects outright,
    * [PARQUET_TYPE_ILLEGAL]), plain TIMESTAMP(MICROS) without timezone
    * (read as TIMESTAMP_NTZ), and TIMESTAMP(MICROS) adjusted to UTC (read
    * as TIMESTAMP). Every operator downstream assumes the session-zoned
    * TIMESTAMP type (`unix_micros`, `window()`, streaming watermarks), so
    * this loader normalizes all three flavors to it here, in ONE place:
    *  - INT64 nanos: read nanos as long and convert with integer
    *    division — ns epoch values (~1.7e18) exceed 2^53, so this MUST be
    *    `div`, never a double-typed `/`. Requires
    *    `spark.sql.legacy.parquet.nanosAsLong=true` on the session — set
    *    it at session construction (Verify/Bench/TestSpark do). Loaders
    *    are side-effect-free: a table getter must never silently change
    *    how every later read in the session treats TIMESTAMP(NANOS).
    *  - TIMESTAMP_NTZ: cast to TIMESTAMP. Sessions run in UTC (enforced
    *    at session build), so the wall-clock values are preserved exactly
    *    and match what DuckDB's naive read of the same file sees.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Don't gate on the conf up front: an events table regenerated with
    // proper TIMESTAMP(MICROS) loads fine without the legacy flag and
    // must not be rejected. Only a NANOS-typed file needs it — translate
    // Spark's opaque failure into the actionable message then.
    val raw =
      try load(s, d, "events")
      catch {
        case e: Throwable if String.valueOf(e.getMessage).contains("PARQUET_TYPE_ILLEGAL")
            || String.valueOf(e.getMessage).contains("TIMESTAMP(NANOS") =>
          throw new IllegalStateException(
            "events.parquet stores ts as TIMESTAMP(NANOS); set " +
              "spark.sql.legacy.parquet.nanosAsLong=true at session build time to read it", e)
      }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case TimestampType    => raw
      // fail HERE, where the promise to normalize is made — a silent
      // pass-through of e.g. a string ts would surface as opaque operator
      // errors far from this loader
      case other => throw new IllegalStateException(
        s"events.parquet stores ts as unsupported type ${other.sql}; " +
          "Tables.events normalizes INT64-nanos, TIMESTAMP and TIMESTAMP_NTZ only")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
