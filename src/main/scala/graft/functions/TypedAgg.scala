package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation (SURVEY.md §7.3: the `Aggregator[IN,BUF,OUT]`
  * surface — a user reduce that composes inside `agg()` next to
  * built-ins, with Spark merging partial buffers across partitions
  * map-side like any native aggregate).
  *
  * Exact decimal accumulation, same contract as [[graft.operators.Parity]]:
  * the buffer holds scaled longs (4 decimal places), so merge order can
  * never change the result and the DuckDB oracle twin
  * `sum(CAST(v AS DECIMAL(18,4)) * CAST(w AS DECIMAL(18,4))) /
  *  sum(CAST(w AS DECIMAL(18,4)))` matches exactly on the harness
  * domain (|v*w| sums < ~9e14 at the buffer's 1e8 scale).
  */
object WeightedAvg extends Aggregator[Row, (Long, Long), Double] {

  private def scaled(x: Double): Long = math.round(x * 10000d)

  def zero: (Long, Long) = (0L, 0L)

  def reduce(b: (Long, Long), r: Row): (Long, Long) = {
    val v = scaled(r.getDouble(0))
    val w = scaled(r.getDouble(1))
    (b._1 + v * w, b._2 + w) // v*w carries scale 1e8, w scale 1e4
  }

  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN
    else {
      // Mirror the oracle's CAST(decimal AS DOUBLE)/CAST(decimal AS
      // DOUBLE) exactly: each scaled sum converts with one correct
      // rounding (the sums stay < 2^53 on the harness domain, so the
      // long→double step is exact), then one double division — the
      // same three operations DuckDB performs, hence bit-identical.
      (b._1.toDouble / 1e8) / (b._2.toDouble / 1e4)
    }

  def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
