package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document fingerprint math shared by the native expressions below and
  * the UDF fallbacks in Dedup. Static-forwarder methods so whole-stage
  * codegen can call them directly (`graft.functions.DocHashes.simhash(...)`)
  * — the generated code stays a single static call per row, no interpreted
  * expression-tree walk and, crucially, NO explode + re-group shuffle: the
  * fingerprint is computed where the document row already lives.
  */
object DocHashes {
  private final val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  /** xxhash64 of each `shingle`-word space-joined gram. shingle=1 hashes
    * single words. Grams touching a null element hash as if the null were
    * the empty string (split() never yields nulls, but SQL callers can
    * pass arrays with them — never NPE). */
  def shingleHashes(words: ArrayData, shingle: Int): Array[Long] = {
    val n = words.numElements()
    val m = math.max(n - shingle + 1, 0)
    val out = new Array[Long](m)
    def word(i: Int): UTF8String = {
      val w = if (words.isNullAt(i)) null else words.getUTF8String(i)
      if (w == null) UTF8String.EMPTY_UTF8 else w
    }
    var i = 0
    while (i < m) {
      var g = word(i)
      var j = 1
      while (j < shingle) {
        g = UTF8String.concat(g, Space, word(i + j))
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(g.getBaseObject, g.getBaseOffset, g.numBytes, Seed)
      i += 1
    }
    out
  }

  /** 64-bit SimHash over word hashes: bit b = sign of Σ ±1 over bit b of
    * each gram hash (same math as functions.SimHash, computed per row). */
  def simhash(words: ArrayData, shingle: Int): Long = {
    val hs = shingleHashes(words, shingle)
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** k-minima MinHash signature: sig(j) = min over grams of
    * xxh64(gramHash, seed=j). Empty input → all Long.MaxValue (callers
    * filter short docs). */
  def minhash(words: ArrayData, shingle: Int, k: Int): Array[Long] = {
    val hs = shingleHashes(words, shingle)
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        val v = XXH64.hashLong(h, j.toLong)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  // Seq[String] twins for the UDF fallback path (bit-identical: same bytes
  // hashed with the same seeds).
  def shingleHashesSeq(words: Seq[String], shingle: Int): Array[Long] = {
    val arr = new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])
    shingleHashes(arr, shingle)
  }
  def simhashSeq(words: Seq[String], shingle: Int): Long = {
    val arr = new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])
    simhash(arr, shingle)
  }
  def minhashSeq(words: Seq[String], shingle: Int, k: Int): Array[Long] = {
    val arr = new GenericArrayData(words.map(w => UTF8String.fromString(w)).toArray[Any])
    minhash(arr, shingle, k)
  }
}

private[functions] trait WordsInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} requires array<string>, got ${other.sql}")
  }
}

/** Native per-document SimHash: `graft_simhash(words)` → 64-bit fingerprint.
  * Replaces explode → 64-bit-counter aggregate with a projection — at scale
  * that removes a token-cardinality shuffle entirely. */
case class SimHashDoc(child: Expression, shingle: Int = 1)
    extends UnaryExpression with WordsInput {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(words: Any): Any =
    DocHashes.simhash(words.asInstanceOf[ArrayData], shingle)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DocHashes.simhash($c, $shingle)")
  override protected def withNewChildInternal(newChild: Expression): SimHashDoc =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

/** Native per-document MinHash signature: `graft_minhash(words)` →
  * array<bigint> of k minima over `shingle`-word grams. */
case class MinHashSigDoc(child: Expression, shingle: Int = 3, k: Int = 16)
    extends UnaryExpression with WordsInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(words: Any): Any =
    new GenericArrayData(DocHashes.minhash(words.asInstanceOf[ArrayData], shingle, k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.DocHashes.minhash($c, $shingle, $k))")
  override protected def withNewChildInternal(newChild: Expression): MinHashSigDoc =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}
