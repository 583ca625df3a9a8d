package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded smallest-k aggregate over longs — the mergeable primitive that
  * makes "first k sorted ids per group" safe on power-law groups. The naive
  * formulation (`row_number() OVER (PARTITION BY term)` or
  * `sort_array(collect_list(id))[1:k]`) buffers or sorts EVERY member of a
  * group in one task: at web scale a stopword term has ~n_docs postings and
  * that one task is the classic straggler/OOM. This aggregate's state is a
  * sorted array of at most k longs no matter how many rows a group has, it
  * partial-aggregates on every map task, and `merge` is associative — so a
  * hot group arrives at its reducer as one ≤k-entry buffer per map
  * partition instead of its full posting list. O(k) state, O(k) merge,
  * exact answer under any partitioning.
  */
object BoundedMinK {

  /** Aggregation buffer: ascending sorted array of the k smallest values
    * seen. Insertion is shift-based — O(k) worst case, O(1) in the common
    * reject path (`v >= buf(len-1)` once full), fine for the small k this
    * exists for (posting caps, top-row previews). */
  final class LongMinK(val k: Int) extends Serializable {
    private[functions] var buf: Array[Long] = new Array[Long](k)
    private[functions] var len: Int = 0

    def insert(v: Long): Unit = {
      if (len == k && v >= buf(k - 1)) return
      var i = (if (len < k) len else k - 1) - 1
      while (i >= 0 && buf(i) > v) { buf(i + 1) = buf(i); i -= 1 }
      buf(i + 1) = v
      if (len < k) len += 1
    }

    def mergeWith(o: LongMinK): Unit = {
      var i = 0
      while (i < o.len) { insert(o.buf(i)); i += 1 }
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 8 * len)
      bb.putInt(k)
      bb.putInt(len)
      var i = 0
      while (i < len) { bb.putLong(buf(i)); i += 1 }
      bb.array()
    }
  }

  object LongMinK {
    def fromBytes(bytes: Array[Byte]): LongMinK = {
      val bb = ByteBuffer.wrap(bytes)
      val sk = new LongMinK(bb.getInt)
      sk.len = bb.getInt
      var i = 0
      while (i < sk.len) { sk.buf(i) = bb.getLong; i += 1 }
      sk
    }
  }

  /** `graft_min_k(id, k)` → array<bigint>: the k smallest non-null inputs
    * of the group, ascending (fewer if the group is smaller). */
  case class BoundedMinKAgg(
      child: Expression,
      k: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongMinK] with UnaryLike[Expression] {

    override def createAggregationBuffer(): LongMinK = new LongMinK(k)

    override def update(b: LongMinK, input: InternalRow): LongMinK = {
      val v = child.eval(input)
      if (v != null) b.insert(v.asInstanceOf[Long])
      b
    }

    override def merge(b: LongMinK, o: LongMinK): LongMinK = { b.mergeWith(o); b }

    override def eval(b: LongMinK): Any =
      new GenericArrayData(java.util.Arrays.copyOf(b.buf, b.len))

    override def serialize(b: LongMinK): Array[Byte] = b.toBytes
    override def deserialize(bytes: Array[Byte]): LongMinK = LongMinK.fromBytes(bytes)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case LongType if k > 0 => TypeCheckResult.TypeCheckSuccess
        case LongType => TypeCheckResult.TypeCheckFailure(s"k must be positive: $k")
        case t => TypeCheckResult.TypeCheckFailure(s"graft_min_k expects bigint, got $t")
      }

    override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinKAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinKAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): BoundedMinKAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_min_k"
  }

  def minK(c: Column, k: Int): Column =
    toColumn(BoundedMinKAgg(toExpression(c), k).toAggregateExpression())
}
