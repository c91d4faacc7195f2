package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** One-pass first/second-moment sums over an embedding column in
  * FLOOR-MICRO integer units ([[GramSums.unitsOf]]): `n`, `s1(i) =
  * Σ floor(v_i·1e6)`, `s2(i·d+j) = Σ floor(v_i·v_j·1e6)`.
  */
case class GramBuf(n: Long, s1: Seq[Long], s2: Seq[Long])

/** Typed aggregator computing [[GramBuf]] for `embed_pca` — the dense
  * second-moment (Gram) accumulation a covariance/PCA pass needs, in
  * ONE scan with map-side partial merge (the d² state rides the
  * aggregation buffer; nothing row-proportional crosses the shuffle).
  *
  * Exactness contract (the Parity discipline in integer form): every
  * per-element contribution is `floor(x·1e6)` of an exactly-computed
  * double — float→double widening is exact, the product of two
  * float-derived doubles carries ≤48 mantissa bits so it is exact, the
  * ·1e6 step is one IEEE rounding identical in both engines, and floor
  * of a double is engine-independent — so the accumulated LONG sums
  * are order-insensitive and bit-identical to DuckDB's
  * `sum(CAST(floor(v[i]*v[j]*1000000.0) AS BIGINT))` over
  * `CAST(embedding AS DOUBLE[])`. Domain: |v_i| ≲ 1e3 and n ≲ 1e12
  * keep every sum far inside Long range.
  *
  * Scale note: reduce copies the d+d² buffer per input row (encoder
  * safety — Spark may serialize the buffer between calls). The
  * PRODUCTION form is [[GramSumsAgg]], the `TypedImperativeAggregate`
  * twin with an in-place long-array buffer (zero per-row allocation) —
  * an encoding change only: `GramSumsSpec` pins both forms emit
  * identical sums. This typed form remains the streaming-state shape
  * (`stream_moments` holds exactly this Aggregator's buffer in the
  * state store via `KeyValueGroupedDataset.agg`).
  */
class GramSums(d: Int) extends Aggregator[Seq[Float], GramBuf, GramBuf] {

  def zero: GramBuf =
    GramBuf(0L, Vector.fill(d)(0L), Vector.fill(d * d)(0L))

  def reduce(b: GramBuf, v: Seq[Float]): GramBuf = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val a = new Array[Double](d)
    var i = 0
    while (i < d) { a(i) = v(i).toDouble; i += 1 }
    val s1 = b.s1.toArray
    val s2 = b.s2.toArray
    i = 0
    while (i < d) {
      s1(i) += GramSums.unitsOf(a(i))
      var j = 0
      while (j < d) {
        s2(i * d + j) += GramSums.unitsOf(a(i) * a(j))
        j += 1
      }
      i += 1
    }
    GramBuf(b.n + 1L, s1.toIndexedSeq, s2.toIndexedSeq)
  }

  def merge(x: GramBuf, y: GramBuf): GramBuf =
    GramBuf(x.n + y.n,
      x.s1.lazyZip(y.s1).map(_ + _),
      x.s2.lazyZip(y.s2).map(_ + _))

  def finish(b: GramBuf): GramBuf = b

  def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}

object GramSums {
  /** Floor-micro quantization — ONE spelling for Spark and (as
    * `floor(x * 1000000.0)`) the DuckDB twin.
    */
  def unitsOf(x: Double): Long = math.floor(x * 1000000.0).toLong
}

/** The PRODUCTION form of [[GramSums]]: a native
  * `TypedImperativeAggregate` whose buffer is ONE flat long array
  * `[n, s1(0..d−1), s2(0..d²−1)]` mutated IN PLACE — per-row cost is
  * the arithmetic alone (the typed Aggregator re-materializes the
  * d+d² buffer through its encoder every reduce), and partial buffers
  * ship across the shuffle as a single 8·(1+d+d²)-byte blob. The
  * emitted sums are BIT-IDENTICAL to the typed form's (same
  * [[GramSums.unitsOf]] per-element contribution, same integer adds;
  * `GramSumsSpec` pins the equivalence), so the two are
  * interchangeable encodings of one contract — this one carries
  * `embed_pca`'s corpus-sized scan.
  */
case class GramSumsAgg(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(d > 0, s"GramSumsAgg needs a positive dimension; got $d")

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case dt => throw new IllegalArgumentException(
      s"GramSumsAgg expects array<float> or array<double>; got $dt")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + d + d * d)

  // Writer-side scratch for one row's widened components — update()
  // runs single-threaded per task instance, so reuse keeps the
  // per-row cost allocation-free (the zero-allocation contract the
  // imperative form exists for). Transient: never serialized.
  @transient private lazy val scratch = new Array[Double](d)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d,
        s"expected dim $d, got ${arr.numElements()}")
      val a = scratch
      var i = 0
      while (i < d) {
        a(i) = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      b(0) += 1L
      i = 0
      while (i < d) {
        b(1 + i) += GramSums.unitsOf(a(i))
        val row = 1 + d + i * d
        var j = 0
        while (j < d) {
          b(row + j) += GramSums.unitsOf(a(i) * a(j))
          j += 1
        }
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = InternalRow(
    b(0),
    new GenericArrayData(java.util.Arrays.copyOfRange(b, 1, 1 + d)),
    new GenericArrayData(java.util.Arrays.copyOfRange(b, 1 + d, b.length)))

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("s1", ArrayType(LongType, containsNull = false)),
    StructField("s2", ArrayType(LongType, containsNull = false))))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): GramSumsAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): GramSumsAgg =
    copy(child = newChild)
}

object GramSumsAgg {
  /** Column wrapper: `GramSumsAgg(v, d)` over an `array<float>` or
    * `array<double>` column yields one `(n, s1, s2)` struct.
    */
  def apply(v: Column, d: Int): Column =
    GraftBridge.column(
      GramSumsAgg(GraftBridge.expression(v), d).toAggregateExpression())
}
