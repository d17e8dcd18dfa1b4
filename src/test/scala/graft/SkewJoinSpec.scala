package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

/** Salted join correctness: identical results to the plain join, and the
  * salt actually spreads a hot key across sub-keys. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals plain join on a skewed workload") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    // make the workload skewed: collapse most keys onto one hot customer
    val skewed = orders.withColumn("o_custkey",
      when(pmod(col("o_custkey"), lit(4L)) =!= 0, lit(1L)).otherwise(col("o_custkey")))
    val dim = Tables.customer(spark, TestSpark.sfDir).select("c_custkey", "c_name")
      .withColumnRenamed("c_custkey", "o_custkey")

    val plain = skewed.join(dim, Seq("o_custkey")).orderBy("o_orderkey")
      .collect().toSeq
    val salted = SkewJoin.saltedJoin(skewed, dim, "o_custkey",
        identityCols = Seq("o_orderkey"), saltFactor = 8)
      .orderBy("o_orderkey").collect().toSeq
    assert(salted === plain)
  }

  test("salted join rejects right/full outer (per-replica duplication)") {
    val df = Tables.orders(spark, TestSpark.sfDir).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, TestSpark.sfDir)
      .select(col("c_custkey").as("o_custkey"))
    Seq("right_outer", "full_outer", "full").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedJoin(df, dim, "o_custkey", Seq("o_orderkey"), 4, jt)
      }
      assert(e.getMessage.contains("does not support"))
    }
  }

  test("salt spreads the hot key across sub-keys") {
    val orders = Tables.orders(spark, TestSpark.sfDir)
      .select("o_orderkey").withColumn("k", lit(1L))
    val salts = orders
      .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts == 8, "a hot key must fan out over all salt values")
  }
}
