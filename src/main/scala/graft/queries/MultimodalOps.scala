package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Multimodal

/** Registered multimodal queries. The harness has no binary media table,
  * so document text bytes stand in as the opaque payload (UTF-8 cast to
  * binary) — the schema/plumbing is payload-agnostic by construction.
  */
object MultimodalOps {

  val FrameBytes = 256

  /** Frame-sampling arithmetic as a pure relational query (oracle-able):
    * one row per 256-byte frame of each payload.
    */
  def frames(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(col("text").cast("binary")).cast("long").as("byte_len"))
      .withColumn("n_frames",
        greatest(lit(1L), ceil(col("byte_len") / lit(FrameBytes.toDouble)).cast("long")))
      .select(col("doc_id"), col("byte_len"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
      .withColumn("frame_off", col("frame_idx") * FrameBytes)
      .orderBy("doc_id", "frame_idx")

  /** The full decode path through [[Multimodal.extractFrames]] with the
    * stub decoder (rows-only: the fake features have no SQL twin).
    */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        lit("text/plain").as("mime"))
      .as[Multimodal.MediaRow]
    Multimodal.extractFrames(media, Multimodal.FakeDecoder, FrameBytes)(spark)
      .toDF()
      .orderBy("media_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_frames" -> (frames _),
    "multimodal_features" -> (features _),
  )

  val oracle: Map[String, String] = Map(
    "multimodal_frames" ->
      s"""SELECT doc_id, byte_len,
         |  unnest(generate_series(0, n_frames - 1)) AS frame_idx,
         |  unnest(generate_series(0, n_frames - 1)) * $FrameBytes AS frame_off
         |FROM (
         |  SELECT doc_id,
         |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         |    greatest(1, CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT)) AS n_frames
         |  FROM documents) t
         |ORDER BY doc_id, frame_idx""".stripMargin,
  )
}
