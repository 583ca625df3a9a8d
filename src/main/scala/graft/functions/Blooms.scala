package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen'd expression — the runtime-
  * filter pattern applied to decontamination: build a filter over the TINY
  * side (eval-set n-grams, MBs even when the corpus is 100 TB), ship it to
  * every task, and turn the big-side "does this gram collide?" probe into a
  * per-row bit test instead of a join. The exact join stays the gated
  * ground truth (q69); the Bloom pass is the cheap pre-filter whose
  * no-false-negative guarantee is itself oracle-pinned (q78).
  *
  * The filter object rides along with the expression (Spark's sketch
  * BloomFilter is Serializable and hashes with a fixed-seed Murmur3, so
  * membership is deterministic across runs and executors); codegen
  * references it via `addReferenceObj` — no per-row deserialization.
  */
object Blooms {

  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case t =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"bloom_might_contain expects string, got $t")
      }
    override protected def nullSafeEval(v: Any): Any =
      bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
    override def prettyName: String = "bloom_might_contain"
  }

  def mightContain(c: Column, bloom: BloomFilter): Column =
    toColumn(BloomMightContain(toExpression(c), bloom))
}
