package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/** Bounded top-k state: parallel arrays sorted by (score desc, key asc),
  * never longer than k. A case class of arrays keeps the buffer inside
  * Spark's product encoder (codegen-friendly, no kryo blobs).
  */
case class TopKBuf(scores: Array[Double], keys: Array[Long])

/** Top-k-per-group as a typed `Aggregator`: the scale-correct shape for
  * "best k rows per group". The window-function formulation
  * (`row_number` + filter) shuffles and sorts EVERY row of the group;
  * this aggregator reduces each partition to at most k rows per group
  * before the exchange — the shuffle then carries O(groups × k ×
  * partitions) rows regardless of corpus size, and partial buffers merge
  * associatively map-side like any native aggregate.
  *
  * Ordering is (score desc, key asc), so ties are deterministic and the
  * DuckDB twin is `row_number() OVER (ORDER BY score DESC, key) <= k`.
  * Scores are compared and carried, never arithmetically combined, so
  * doubles stay bit-identical across engines.
  */
class TopKAgg(k: Int) extends Aggregator[Row, TopKBuf, TopKBuf] {

  def zero: TopKBuf = TopKBuf(Array.empty, Array.empty)

  private def bounded(pairs: Seq[(Double, Long)]): TopKBuf = {
    val top = pairs.sortBy { case (s, key) => (-s, key) }.take(k)
    TopKBuf(top.map(_._1).toArray, top.map(_._2).toArray)
  }

  def reduce(b: TopKBuf, r: Row): TopKBuf =
    if (r.isNullAt(0) || r.isNullAt(1)) b
    else bounded((r.getDouble(0), r.getLong(1)) +: b.scores.zip(b.keys).toSeq)

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    bounded(a.scores.zip(a.keys).toSeq ++ b.scores.zip(b.keys).toSeq)

  def finish(b: TopKBuf): TopKBuf = b

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}

/** The one udaf construction + buffer-unpacking contract every query
  * site shares (topk_groups, simsearch_knn_batch, sample_stratified,
  * text_search_batch) — so the arrays_zip field naming, the `pos + 1`
  * rank convention, and the Row(score, key) argument encoding live in
  * exactly one place.
  */
object TopKAgg {

  /** SQL-callable form: arguments are (score: Double, key: Long). */
  def asUdaf(k: Int): UserDefinedFunction =
    udaf(new TopKAgg(k), Encoders.row(StructType(Seq(
      StructField("score", DoubleType), StructField("key", LongType)))))

  /** Unpack an aggregated [[TopKBuf]] struct column into one row per
    * ranked entry — (`keep`*, rank: Long from 1, score: Double,
    * key: Long) in the buffer's (score desc, key asc) order.
    */
  def exploded(df: DataFrame, bufCol: String, keep: Seq[String]): DataFrame =
    df.select(keep.map(col) :+
        posexplode(arrays_zip(col(s"$bufCol.scores"), col(s"$bufCol.keys"))): _*)
      .select(keep.map(col) ++ Seq(
        (col("pos") + 1).cast("long").as("rank"),
        col("col.scores").as("score"),
        col("col.keys").as("key")): _*)
}
