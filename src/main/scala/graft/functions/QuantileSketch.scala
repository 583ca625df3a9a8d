package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile summary as a native `TypedImperativeAggregate` — the
  * engine-extension tier ABOVE a codegen'd scalar kernel: a custom aggregate
  * with its own binary buffer that Spark partial-aggregates on every map
  * task and merges on the reduce side, exactly like `approx_percentile`'s
  * internal sketch. This is the distributed-systems contract that matters
  * at 100 TB: per-partition state is O(k·log(n/k)) regardless of data
  * volume, and `merge` is associative over any partitioning, so the shuffle
  * carries kilobyte sketches instead of value buffers (q54's exact
  * `percentile` buffers every group value — its documented cost).
  *
  * The summary is the classic deterministic Munro–Paterson / MRL binary-
  * carry scheme: a fill buffer of k raw values promotes, when full, into a
  * ladder of sorted k-item buffers where level l items each stand for 2^l
  * originals; two occupied buffers at the same level merge-sort and keep
  * alternate elements (one collapse = one carry, like binary addition).
  * Every collapse at level l displaces a value's rank by at most 2^l, and
  * there are at most n/(k·2^(l+1)) collapses per level, so the total rank
  * error is bounded by L·n/(2k) for L ≈ log2(n/k) levels — ~0.15% of n at
  * k = 1024, n = 10^6, growing only logarithmically with n. No randomness
  * anywhere: the bound is a worst-case certainty, not a with-high-
  * probability claim, which is what makes the gated accuracy booleans
  * (q102) stable under any partitioning or merge order.
  */
object QuantileSketch {

  /** The aggregation buffer. Invariant: fillLen + k·Σ(occupied 2^l) = n. */
  final class MrlSketch(val k: Int) extends Serializable {
    var n: Long = 0L
    private[functions] var fill: Array[Double] = new Array[Double](k)
    private[functions] var fillLen: Int = 0
    private[functions] var levels: Array[Array[Double]] = Array.empty

    def insert(v: Double): Unit = {
      fill(fillLen) = v
      fillLen += 1
      n += 1
      if (fillLen == k) {
        val b = java.util.Arrays.copyOf(fill, k)
        java.util.Arrays.sort(b)
        fillLen = 0
        carry(b, 0)
      }
    }

    private def ensureLevels(l: Int): Unit =
      if (levels.length <= l) levels = java.util.Arrays.copyOf(levels, l + 1)

    @annotation.tailrec
    private def carry(b: Array[Double], level: Int): Unit = {
      ensureLevels(level)
      if (levels(level) == null) levels(level) = b
      else {
        val other = levels(level)
        levels(level) = null
        carry(mergeHalve(other, b), level + 1)
      }
    }

    /** Merge-sort two sorted k-arrays, keep the odd positions of the 2k
      * result (a fixed, deterministic choice — any fixed parity gives the
      * same worst-case bound). */
    private def mergeHalve(a: Array[Double], b: Array[Double]): Array[Double] = {
      val out = new Array[Double](k)
      var i = 0; var j = 0; var t = 0
      while (t < 2 * k) {
        val v =
          if (j >= k || (i < k && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if ((t & 1) == 1) out(t >> 1) = v
        t += 1
      }
      out
    }

    def mergeWith(o: MrlSketch): Unit = {
      require(o.k == k, s"cannot merge sketches of different k: $k vs ${o.k}")
      n += o.n - o.fillLen // carried buffers move wholesale; fill re-inserts
      var l = 0
      while (l < o.levels.length) {
        if (o.levels(l) != null) carry(o.levels(l).clone(), l)
        l += 1
      }
      var i = 0
      while (i < o.fillLen) { insert(o.fill(i)); i += 1 }
    }

    /** Smallest summary value whose cumulative weight reaches ceil(p·n). */
    def quantile(p: Double): Double = {
      if (n == 0) return Double.NaN
      var m = fillLen
      var l = 0
      while (l < levels.length) { if (levels(l) != null) m += k; l += 1 }
      val vals = new Array[Double](m)
      val wts = new Array[Long](m)
      var t = 0
      var i = 0
      while (i < fillLen) { vals(t) = fill(i); wts(t) = 1L; t += 1; i += 1 }
      l = 0
      while (l < levels.length) {
        if (levels(l) != null) {
          val w = 1L << l
          var j = 0
          while (j < k) { vals(t) = levels(l)(j); wts(t) = w; t += 1; j += 1 }
        }
        l += 1
      }
      // sort pairs by value (indices sorted by vals)
      val idx = Array.range(0, m).sortBy(vals(_))
      val target = math.max(1L, math.ceil(p * n).toLong)
      var cum = 0L
      var r = 0
      while (r < m) {
        cum += wts(idx(r))
        if (cum >= target) return vals(idx(r))
        r += 1
      }
      vals(idx(m - 1))
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(k)
      out.writeLong(n)
      out.writeInt(fillLen)
      var i = 0
      while (i < fillLen) { out.writeDouble(fill(i)); i += 1 }
      out.writeInt(levels.length)
      var l = 0
      while (l < levels.length) {
        val occupied = levels(l) != null
        out.writeBoolean(occupied)
        if (occupied) {
          var j = 0
          while (j < k) { out.writeDouble(levels(l)(j)); j += 1 }
        }
        l += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  object MrlSketch {
    def fromBytes(bytes: Array[Byte]): MrlSketch = {
      val in = ByteBuffer.wrap(bytes)
      val sk = new MrlSketch(in.getInt)
      sk.n = in.getLong
      sk.fillLen = in.getInt
      var i = 0
      while (i < sk.fillLen) { sk.fill(i) = in.getDouble; i += 1 }
      val nLevels = in.getInt
      sk.levels = new Array[Array[Double]](nLevels)
      var l = 0
      while (l < nLevels) {
        if (in.get() != 0) {
          val b = new Array[Double](sk.k)
          var j = 0
          while (j < sk.k) { b(j) = in.getDouble; j += 1 }
          sk.levels(l) = b
        }
        l += 1
      }
      sk
    }
  }

  /** `graft_quantile_sketch(value, percentiles)` → array<double> of
    * estimates, one per requested percentile (null on an empty group). */
  case class QuantileSketchAgg(
      child: Expression,
      percentiles: Seq[Double],
      k: Int = 1024,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MrlSketch] with UnaryLike[Expression] {

    override def createAggregationBuffer(): MrlSketch = new MrlSketch(k)

    override def update(b: MrlSketch, input: InternalRow): MrlSketch = {
      val v = child.eval(input)
      if (v != null) b.insert(v.asInstanceOf[Double])
      b
    }

    override def merge(b: MrlSketch, o: MrlSketch): MrlSketch = { b.mergeWith(o); b }

    override def eval(b: MrlSketch): Any =
      if (b.n == 0) null
      else new GenericArrayData(percentiles.map(b.quantile).toArray)

    override def serialize(b: MrlSketch): Array[Byte] = b.toBytes
    override def deserialize(bytes: Array[Byte]): MrlSketch = MrlSketch.fromBytes(bytes)

    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case DoubleType =>
          if (percentiles.forall(p => p > 0.0 && p < 1.0))
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"percentiles must lie in (0, 1): $percentiles")
        case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_quantile_sketch expects double, got $t")
      }

    override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): QuantileSketchAgg =
      copy(child = newChild)
    override def prettyName: String = "graft_quantile_sketch"
  }

  def quantileSketch(c: Column, percentiles: Seq[Double], k: Int = 1024): Column =
    toColumn(QuantileSketchAgg(toExpression(c), percentiles, k).toAggregateExpression())
}
