package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
  * safety — Spark may serialize the buffer between calls); at
  * production row counts the same fold would move to a
  * TypedImperativeAggregate with an in-place long array, an encoding
  * change only — the emitted sums are identical.
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
