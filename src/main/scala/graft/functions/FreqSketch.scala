package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items buffer with capacity k.
  *
  * Update is the classic rule: increment a held counter, insert while
  * below capacity, otherwise decrement every counter by one and drop
  * zeros (amortized O(1): each decrement cancels one prior increment).
  * Merge is the mergeable-summaries rule (Agarwal et al., PODS'12):
  * add counts pointwise, then subtract the (k+1)-th largest count and
  * drop non-positives. Under any split/merge tree over a stream of n
  * items the total undercount is at most n/(k+1), so every item with
  * true frequency > n/(k+1) is guaranteed to survive with a positive
  * counter — the property the two-pass exact heavy-hitters query
  * builds on. Held counts are LOWER bounds on true frequency.
  */
final class MgBuf(val k: Int) {
  private[functions] val counts = mutable.HashMap.empty[String, Long]

  def offer(w: String): Unit = counts.get(w) match {
    case Some(c) => counts.update(w, c + 1L)
    case None if counts.size < k => counts.update(w, 1L)
    case None =>
      counts.mapValuesInPlace((_, c) => c - 1L)
      counts.filterInPlace((_, c) => c > 0L)
  }

  def absorb(other: MgBuf): Unit = {
    other.counts.foreach { case (w, c) =>
      counts.update(w, counts.getOrElse(w, 0L) + c)
    }
    if (counts.size > k) {
      // (k+1)-th largest count; subtracting it leaves at most k positives
      val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      counts.mapValuesInPlace((_, c) => c - cut)
      counts.filterInPlace((_, c) => c > 0L)
    }
  }

  /** Restore held counters verbatim (state/deserialization path — NOT an
    * offer: restored counts must not re-trigger eviction accounting). */
  def seed(ws: Iterable[(String, Long)]): Unit =
    ws.foreach { case (w, c) => counts.update(w, c) }

  /** The held counters as an immutable snapshot (state persistence). */
  def snapshot: Map[String, Long] = counts.toMap

  /** Deterministic rendering OF THIS BUFFER (count desc, word asc). The
    * buffer content itself depends on stream partitioning — callers that
    * need a deterministic result must recount candidates exactly
    * (TextOps.qHeavyHitters) rather than trust the floors. */
  def sorted: Array[(String, Long)] =
    counts.toArray.sortBy { case (w, c) => (-c, w) }
}

/** `graft_mg(item, k)` — a bounded-memory frequent-items aggregate
  * returning `array<struct<word string, freq_floor bigint>>` candidates.
  *
  * Why a TypedImperativeAggregate: exact per-group term frequencies at
  * 100 TB shuffle one row per DISTINCT term — for web-scale text that
  * exchange is the bottleneck. This aggregate runs PARTIAL, so every map
  * task reduces its token stream to at most k counters before the
  * shuffle, and the exchange carries k rows per task regardless of
  * vocabulary size. The candidate set it emits is a guaranteed superset
  * of every item above the n/(k+1) frequency floor (see [[MgBuf]]); an
  * exact second pass over just those candidates makes the final answer
  * exact and deterministic even though the sketch itself is
  * partitioning-dependent.
  *
  * Null items are skipped. k must be a positive int literal.
  */
case class MgFrequentItems(
    item: Expression, k: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuf] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Number].intValue

  override def children: Seq[Expression] = Seq(item, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("freq_floor", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_mg item must be string, got ${item.dataType.sql}")
    else if (!k.foldable || k.dataType != IntegerType ||
      k.eval() == null || k.eval().asInstanceOf[Number].intValue <= 0)
      TypeCheckResult.TypeCheckFailure("graft_mg k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): MgBuf = new MgBuf(kVal)

  override def update(b: MgBuf, input: InternalRow): MgBuf = {
    val w = item.eval(input)
    if (w != null) b.offer(w.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MgBuf, other: MgBuf): MgBuf = { b.absorb(other); b }

  override def eval(b: MgBuf): Any =
    new GenericArrayData(b.sorted.map { case (w, c) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(w), c))
    })

  // Length-prefixed UTF-8, not writeUTF: writeUTF caps a string at
  // 65535 encoded bytes and a web-scale junk document can hold a single
  // unbroken token far past that — the sketch must survive any held word.
  override def serialize(b: MgBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (w, c) =>
      val wb = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(wb.length); out.write(wb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new MgBuf(kVal)
    var j = 0
    while (j < n) {
      val wb = new Array[Byte](in.readInt()); in.readFully(wb)
      b.counts.update(new String(wb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgFrequentItems =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgFrequentItems =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MgFrequentItems =
    copy(item = newChildren(0), k = newChildren(1))
  override def prettyName: String = "graft_mg"
}
