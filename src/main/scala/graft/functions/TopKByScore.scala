package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a k-capped binary heap with the WORST held
  * element at the head, so admission against a full buffer is one
  * compare and eviction is O(log k). "Better" mirrors the ordering the
  * window formulation sorts by — (score desc, id asc) under Spark's SQL
  * double comparison (NaN greatest and tying itself; -0.0 TIES 0.0 via
  * zero normalization) — so the aggregate is result-identical to
  * `row_number().over(orderBy(score.desc, id))` with rank <= k.
  */
final class TopKBuf(val k: Int) {
  private val heap = mutable.PriorityQueue.empty[(Double, Long)](TopKBuf.worstFirst)

  def offer(score: Double, id: Long): Unit = {
    val e = (score, id)
    if (heap.size < k) heap.enqueue(e)
    else if (TopKBuf.better(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
  }

  /** Internal order is heap order — callers only rely on the multiset. */
  def entries: Iterator[(Double, Long)] = heap.iterator

  def sortedBestFirst: Array[(Double, Long)] = heap.toArray.sortWith(TopKBuf.better)
}

object TopKBuf {
  /** SQL comparison semantics for the score: Spark normalizes -0.0 to
    * 0.0 in comparison keys (UnsafeRow normalization), so a window sort
    * ties the two zeros and falls to the id tie-break — this aggregate
    * must do the same or the two faces diverge on a -0.0 score
    * (SimilaritySpec pins the case). NaN passes through: compare(NaN,
    * NaN) = 0 (tie → id) and NaN ranks greatest, Spark's sort order. */
  private def normZero(d: Double): Double = if (d == 0.0d) 0.0d else d

  /** Strict "x outranks y": higher score first, id ascending on ties. */
  def better(x: (Double, Long), y: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(normZero(x._1), normZero(y._1))
    if (c != 0) c > 0 else x._2 < y._2
  }

  /** PriorityQueue dequeues its maximum; with better-as-less-than the
    * maximum is the WORST held element — exactly what eviction wants. */
  val worstFirst: Ordering[(Double, Long)] = Ordering.fromLessThan(better)
}

/** `graft_topk(score, id, k)` — top-k (id, score) pairs per group as one
  * bounded aggregate, best first, ties by id ascending.
  *
  * Why a TypedImperativeAggregate: the window formulation of per-group
  * top-k (`row_number over (partition by g order by score desc)`) must
  * SORT every candidate row of a group before discarding all but k —
  * for ANN scoring that is a sort of |corpus| rows per query. This
  * aggregate keeps a k-capped heap instead, and because it is a real
  * Catalyst aggregate it runs PARTIAL: every map task reduces its
  * candidates to k before the shuffle, so the exchange carries
  * k·queries rows instead of the full scored cross product. (Preference
  * order per the engine design: compose builtins < native Expression <
  * UDF — this is the aggregate counterpart of [[DotProduct]].)
  *
  * Determinism contract: the admission ordering is total (score via
  * `java.lang.Double.compare`, ties by id), so the result is invariant
  * to partitioning, merge order, and retries — the property that lets
  * the stored-vs-in-query and window-vs-aggregate equalities be
  * asserted verbatim and the window query's DuckDB oracle be reused
  * unchanged.
  *
  * Null score or id rows are skipped (a null cosine never ranks).
  */
case class TopKByScore(
    score: Expression, id: Expression, k: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Number].intValue

  override def children: Seq[Expression] = Seq(score, id, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("neighbor_id", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk score must be double, got ${score.dataType.sql}")
    else if (id.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk id must be bigint, got ${id.dataType.sql}")
    else if (!k.foldable || k.dataType != IntegerType ||
      k.eval() == null || k.eval().asInstanceOf[Number].intValue <= 0)
      TypeCheckResult.TypeCheckFailure("graft_topk k must be a positive int literal")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(kVal)

  override def update(b: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuf, other: TopKBuf): TopKBuf = {
    other.entries.foreach { case (s, i) => b.offer(s, i) }
    b
  }

  override def eval(b: TopKBuf): Any =
    new GenericArrayData(b.sortedBestFirst.map { case (s, i) =>
      new GenericInternalRow(Array[Any](i, s))
    })

  override def serialize(b: TopKBuf): Array[Byte] = {
    val arr = b.entries.toArray
    val bb = ByteBuffer.allocate(4 + arr.length * 16)
    bb.putInt(arr.length)
    arr.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new TopKBuf(kVal)
    var j = 0
    while (j < n) { b.offer(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1), k = newChildren(2))
  override def prettyName: String = "graft_topk"
}
