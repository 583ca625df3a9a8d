package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio text-quality signal: deflate(text).length /
  * utf8(text).length. A classic pretraining heuristic (used alongside the
  * Gopher rules): natural prose lands in a mid band, while templated spam
  * and repeated boilerplate compress far below it and random/encoded noise
  * sits near (or above) 1.0 — both tails are drop candidates.
  *
  * Deterministic: zlib DEFLATE at a fixed level with a fixed strategy is a
  * pure function of the input bytes. Implemented as a codegen'd unary
  * kernel (one static call per row, Deflater instance reused per thread) so
  * the scan stays inside whole-stage codegen with no UDF serialization.
  */
object Compress {

  private val deflaters: ThreadLocal[Deflater] =
    ThreadLocal.withInitial(() => new Deflater(6, false))

  /** deflated size / raw size; empty input → 1.0. */
  def deflateRatioKernel(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var compressed = 0L
    val out = new Array[Byte](8192)
    while (!d.finished()) compressed += d.deflate(out)
    compressed.toDouble / raw.length.toDouble
  }

  case class DeflateRatio(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case t => TypeCheckResult.TypeCheckFailure(
          s"deflate_ratio expects string, got $t")
      }
    override protected def nullSafeEval(v: Any): Any =
      deflateRatioKernel(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.Compress$$.MODULE$$.deflateRatioKernel($c);")
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "deflate_ratio"
  }

  def deflateRatio(c: Column): Column = toColumn(DeflateRatio(toExpression(c)))
}
