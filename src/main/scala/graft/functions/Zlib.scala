package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Raw-deflate helpers behind [[DeflateLen]]. Level and wrapping are
  * FIXED (level 6, nowrap) — the compressed length is a quality SIGNAL,
  * and a signal must be reproducible across runs, partitions, and the
  * verify twin, so the parameters are part of the contract, not tuning
  * knobs. One Deflater per thread (reset between rows): the native zlib
  * stream allocation is the expensive part, the reset is cheap.
  */
object Zlib {
  val Level = 6
  private val deflater = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(Level, true)
  }
  private val sink = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def deflateLen(in: Array[Byte]): Long = {
    val d = deflater.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = sink.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflateLenUtf8(s: UTF8String): Long = deflateLen(s.getBytes)
}

/** `graft_deflate_len(text|bytes)` — the raw-deflate compressed length of
  * a string's UTF-8 bytes (or of a binary payload), as a native codegen'd
  * expression.
  *
  * Why: compressed-size / raw-size is a standard corpus quality signal
  * (RedPajama-v2 ships it as `ccnet_compression_ratio`-style metadata):
  * highly compressible text is boilerplate or repetition, nearly
  * incompressible text is noise or binary junk. At 100 TB the signal
  * must stream through the scan as a per-row projection — this
  * expression keeps the whole quality pass inside whole-stage codegen
  * (the [[DotProduct]] preference order), with the zlib stream pooled
  * per thread.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_deflate_len requires string or binary input, got ${dt.sql}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Zlib.deflateLenUtf8(s)
    case b: Array[Byte] => Zlib.deflateLen(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => child.dataType match {
      case StringType => s"graft.functions.Zlib.deflateLenUtf8($c)"
      case _ => s"graft.functions.Zlib.deflateLen($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)

  override def prettyName: String = "graft_deflate_len"
}
