package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Open-addressed value→count table keyed on raw double BITS — the
  * aggregation state of [[PercentileFast]]. Key identity is
  * `doubleToLongBits`, exactly the boxed-`Double.equals` identity the
  * built-in Percentile's generic map uses (−0.0 and NaN patterns are
  * distinct keys there too), so the two states hold identical
  * value→count contents. Count 0 marks an empty slot (live counts are
  * ≥ 1), capacity stays a power of two, linear probing.
  */
final class PctBuf(initialCapacity: Int = 1 << 10) {
  var keys: Array[Long] = new Array[Long](initialCapacity)
  var cnts: Array[Long] = new Array[Long](initialCapacity)
  var size: Int = 0

  // Murmur3 fmix64 — the standard long finalizer.
  @inline private def hash(k: Long): Long = {
    var h = k
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33; h
  }

  def add(bits: Long, delta: Long): Unit = {
    if (size * 2 >= keys.length) grow()
    val mask = keys.length - 1
    var i = (hash(bits) & mask).toInt
    while (cnts(i) != 0L && keys(i) != bits) i = (i + 1) & mask
    if (cnts(i) == 0L) { keys(i) = bits; size += 1 }
    cnts(i) += delta
  }

  def countOf(bits: Long): Long = {
    val mask = keys.length - 1
    var i = (hash(bits) & mask).toInt
    while (cnts(i) != 0L && keys(i) != bits) i = (i + 1) & mask
    cnts(i)
  }

  private def grow(): Unit = {
    val ok = keys; val oc = cnts
    keys = new Array[Long](ok.length * 2)
    cnts = new Array[Long](ok.length * 2)
    size = 0
    var i = 0
    while (i < ok.length) {
      if (oc(i) != 0L) add(ok(i), oc(i))
      i += 1
    }
  }
}

/** Exact interpolated percentile over a DOUBLE column — the built-in
  * `percentile`'s contract re-encoded without per-row boxing: the
  * built-in accumulates every input into a generic
  * `OpenHashMap[AnyRef, Long]` (boxed-Double keys, closure-dispatched
  * updates) and sorts boxed tuples at eval, which dominates the whole
  * agg_mad/agg_percentile family's wall time at any scale where a
  * group holds many distinct values. This form keys the SAME counts on
  * raw double bits in primitive arrays, ships partial state as one
  * packed long blob, and sorts primitive longs (the sign-fold
  * bijection below maps IEEE-754 bit patterns to longs whose signed
  * order is the double order).
  *
  * The RESULT is bit-identical to the built-in by construction — same
  * value→count contents (bits identity = boxed-Double identity), same
  * ascending-value cumulative walk, and the final arithmetic is a
  * literal transcription of `PercentileBase.getPercentile`:
  * `position = p·(N−1)`, floor/ceil bracket ranks located by binary
  * search over cumulative counts (insertion-point transform), and
  * `(higher−pos)·lowerKey + (pos−lower)·higherKey` in that exact
  * operation order. `PercentileFastSpec` property-pins equality
  * against the built-in, and every consumer query stays under its
  * DuckDB quantile_cont hash gate.
  *
  * Scope: DoubleType input, foldable non-null percentages, frequency 1
  * — exactly what the registered queries use; anything else should
  * keep using the built-in.
  */
case class PercentileFast(child: Expression, percentages: Seq[Double],
    returnArray: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PctBuf] with UnaryLike[Expression] {

  require(percentages.nonEmpty &&
    percentages.forall(p => p >= 0.0 && p <= 1.0),
    s"percentages must be in [0, 1]; got $percentages")

  // The documented scope is DOUBLE input only; update() casts the
  // evaluated value, so a non-double column must fail at ANALYSIS
  // (naming the offending type), never as an executor-side
  // ClassCastException mid-job.
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PercentileFast requires a DOUBLE input column; " +
          s"got ${child.dataType.catalogString} (cast explicitly or use " +
          "the built-in percentile)")

  override def createAggregationBuffer(): PctBuf = new PctBuf()

  override def update(b: PctBuf, input: InternalRow): PctBuf = {
    val v = child.eval(input)
    if (v != null) {
      b.add(java.lang.Double.doubleToLongBits(
        v.asInstanceOf[Double]), 1L)
    }
    b
  }

  override def merge(b: PctBuf, o: PctBuf): PctBuf = {
    var i = 0
    while (i < o.keys.length) {
      if (o.cnts(i) != 0L) b.add(o.keys(i), o.cnts(i))
      i += 1
    }
    b
  }

  /** Sign-fold: IEEE-754 bit pattern → long whose SIGNED order is the
    * ascending double order (its own inverse). Positive doubles keep
    * their bits (non-negative longs ordered by magnitude); negative
    * doubles flip their magnitude bits so more-negative sorts lower,
    * sign bit intact keeps them below every positive.
    */
  @inline private def fold(bits: Long): Long =
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)

  override def eval(b: PctBuf): Any = {
    if (b.size == 0) return null
    // Ascending distinct values via one primitive sort of folded bits.
    val sorted = new Array[Long](b.size)
    var i = 0; var j = 0
    while (i < b.keys.length) {
      if (b.cnts(i) != 0L) { sorted(j) = fold(b.keys(i)); j += 1 }
      i += 1
    }
    java.util.Arrays.sort(sorted)
    val vals = new Array[Double](b.size)
    val cum = new Array[Long](b.size)
    var running = 0L
    i = 0
    while (i < b.size) {
      val bits = fold(sorted(i))
      vals(i) = java.lang.Double.longBitsToDouble(bits)
      running += b.countOf(bits)
      cum(i) = running
      i += 1
    }
    val n = running
    def locate(rank: Long): Int = {
      val ix = java.util.Arrays.binarySearch(cum, 0, b.size, rank)
      if (ix < 0) -(ix + 1) else ix
    }
    // Literal transcription of PercentileBase.getPercentile.
    val out = percentages.map { p =>
      val position = p * (n - 1).toDouble
      val lower = math.floor(position).toLong
      val higher = math.ceil(position).toLong
      val lowerIndex = locate(lower + 1)
      val lowerKey = vals(lowerIndex)
      if (higher == lower) lowerKey
      else {
        val higherKey = vals(locate(higher + 1))
        if (higherKey == lowerKey) lowerKey
        else (higher - position) * lowerKey + (position - lower) * higherKey
      }
    }
    if (returnArray) new GenericArrayData(out) else out.head
  }

  override def serialize(b: PctBuf): Array[Byte] = {
    // Long arithmetic: with ~134M+ distinct values per group the Int
    // product would overflow NEGATIVE and allocate() would throw a
    // bare IllegalArgumentException; fail with a diagnosis instead.
    val bytes = 4L + b.size.toLong * 16L
    require(bytes <= Int.MaxValue,
      s"PercentileFast partial state with ${b.size} distinct values " +
        s"exceeds the 2 GiB serialization limit; use approx_percentile " +
        "for groups with this many distinct doubles")
    val bb = java.nio.ByteBuffer.allocate(bytes.toInt)
    bb.putInt(b.size)
    var i = 0
    while (i < b.keys.length) {
      if (b.cnts(i) != 0L) { bb.putLong(b.keys(i)); bb.putLong(b.cnts(i)) }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PctBuf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    // Size for n live entries below the 1/2 load factor up front.
    val cap = math.max(1 << 10, Integer.highestOneBit(math.max(n, 1)) * 4)
    val b = new PctBuf(cap)
    var i = 0
    while (i < n) { b.add(bb.getLong, bb.getLong); i += 1 }
    b
  }

  override def dataType: DataType =
    if (returnArray) ArrayType(DoubleType, false) else DoubleType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): PercentileFast =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): PercentileFast =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): PercentileFast =
    copy(child = newChild)
}

object PercentileFast {
  /** `percentile(v, p)` — scalar form. `v` must be a DOUBLE column. */
  def apply(v: Column, p: Double): Column =
    GraftBridge.column(PercentileFast(GraftBridge.expression(v), Seq(p),
      returnArray = false).toAggregateExpression())

  /** `percentile(v, array(ps…))` — array form. */
  def apply(v: Column, ps: Seq[Double]): Column =
    GraftBridge.column(PercentileFast(GraftBridge.expression(v), ps,
      returnArray = true).toAggregateExpression())
}
