package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Single-pass 64-bit SimHash aggregation.
  *
  * Input: one 64-bit token hash per row (e.g. `xxhash64(word)`); output:
  * the SimHash fingerprint whose bit b is the sign of Σ_tokens ±1 over bit
  * b of each token hash.
  *
  * Why a typed Aggregator instead of 64 `sum(when(...))` columns: the
  * widest-aggregate formulation builds 64 independent aggregate buffers
  * and evaluates 64 conditional expressions per input row — measured at
  * 11.6 s (23% of the whole bench) at sf0.1. This aggregator keeps ONE
  * 64-int array per group and updates it in a tight JVM loop, planned as
  * an ObjectHashAggregate with map-side partial aggregation — same single
  * shuffle, ~64× fewer buffer slots. At 100 TB the shuffle carries one
  * 256-byte buffer per document per mapper instead of 64 long columns.
  */
object SimHash {

  private object Agg extends Aggregator[Long, Array[Int], Long] {
    def zero: Array[Int] = new Array[Int](64)

    def reduce(buf: Array[Int], h: Long): Array[Int] = {
      var b = 0
      while (b < 64) {
        buf(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      buf
    }

    def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 64) { a(i) += b(i); i += 1 }
      a
    }

    /** Bit b set iff the (weighted) majority of token hashes set bit b.
      * Ties (count 0) give 0, matching `sum > 0` semantics. */
    def finish(buf: Array[Int]): Long = {
      var fp = 0L
      var b = 0
      while (b < 64) {
        if (buf(b) > 0) fp |= (1L << b)
        b += 1
      }
      fp
    }

    def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column aggregate: `simhash64(col("token_hash"))`. */
  val simhash64: UserDefinedFunction = udaf(Agg)
}
