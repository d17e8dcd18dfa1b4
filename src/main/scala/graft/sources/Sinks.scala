package graft.sources

import org.apache.spark.sql.DataFrame

/** Write-side counterparts to [[Tables]] (S4 + the co-location story).
  *
  * At 100 TB the biggest recurring cost is re-shuffling fact tables for
  * every keyed join/aggregate; bucketed writes pay that shuffle ONCE at
  * write time, after which equi-joins and groupBys on the bucket key plan
  * with no Exchange (verified in SinksSpec by asserting the join plan of
  * two co-bucketed tables is shuffle-free).
  */
object Sinks {

  /** S4 append sink (body:194-214 shape): durable batch append. */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** Retention-style overwrite (S6 rewrite-retain target). */
  def overwriteParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Partitioned-by-column layout — the scan side prunes partitions on
    * the filter key (e.g. daily run_date directories). */
  def overwritePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed table write: co-locates rows by `bucketCols` so later joins
    * and aggregations on those keys are shuffle-free. Requires a table
    * (bucketing metadata lives in the catalog, not the files).
    */
  def saveBucketed(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
