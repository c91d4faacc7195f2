package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (SURVEY.md §2.4):
  * brute-force cosine top-k as the correctness baseline, a bucketed
  * (IVF/LSH-style) variant as the scale path, and embedding-cosine
  * near-dup pairs.
  *
  * Scale posture: the query vector joins as a broadcast single-row
  * relation (never a driver-side collect of the corpus); the bucketed
  * variant prunes the scan to one bucket — the 1/2^bits fraction that
  * can contain sign-compatible neighbors — before scoring; near-dup
  * scoring is blocked by (sign-bucket quantizer, label), never
  * all-pairs across the corpus, and the cell size is tunable via
  * SignBits independent of corpus growth.
  *
  * Parity: embeddings are float32 in parquet; both engines cast to
  * DOUBLE before any arithmetic, and [[VectorOps]] folds in index order,
  * so cosine values are bit-identical and safe to compare and sort on.
  */
object VectorQueries {

  /** The embeddings table with the vector cast to array<double>. */
  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))

  private val QueryVecId = 0

  /** 2^SignBits buckets; 4 bits ≈ corpus/16 per bucket — at larger corpora
    * raise it so buckets stay O(corpus / desired-candidates).
    */
  val SignBits = 4

  /** Brute-force cosine top-10 against the query vector (vec_id 0),
    * broadcast to every scorer task.
    */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = e.filter(col("vec_id") === QueryVecId).select(col("v").as("qv"))
    e.filter(col("vec_id") =!= QueryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Sign bucket over the first `bits` dimensions — a fixed-hyperplane
    * LSH / IVF-style coarse quantizer (deterministic, no trained
    * centroids needed for the harness).
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)

  /** Bucketed ANN: score only vectors in the query's sign bucket.
    * Recall is partial by construction (that is the LSH trade); the
    * bucket is pruned before any vector math runs.
    */
  def topKBucketed(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).withColumn("bucket", signBucket(col("v"), SignBits))
    val q = e.filter(col("vec_id") === QueryVecId)
      .select(col("v").as("qv"), col("bucket").as("qbucket"))
    e.join(broadcast(q), col("bucket") === col("qbucket"))
      .filter(col("vec_id") =!= QueryVecId)
      .select(col("vec_id"), col("bucket"), VectorOps.cosine(col("v"), col("qv")).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(10)
  }

  /** Embedding-cosine near-dup: top-20 most similar pairs within each
    * (sign-bucket, label) block. The coarse quantizer ([[signBucket]],
    * the same expression the bucketed ANN uses) is the primary blocking
    * key: label-only blocks grow linearly with the corpus, so pairs
    * within them grow quadratically — the quantizer splits each label
    * into 2^SignBits cells, and raising SignBits keeps cells (hence
    * pair counts) bounded as the corpus scales. True near-dups are
    * sign-compatible on the leading dimensions by construction, so the
    * block boundary loses only non-candidates.
    */
  def nearDup(spark: SparkSession, dir: String): DataFrame = {
    // Norms are per-vector: compute them once BEFORE the pair join
    // instead of letting cosine() re-derive both inside every pair
    // (3 dot products per pair -> 1). Same doubles, same oracle.
    val e = emb(spark, dir)
      .withColumn("n", VectorOps.norm(col("v")))
      .withColumn("bucket", signBucket(col("v"), SignBits))
    val a = e.select(col("vec_id").as("a"), col("label"), col("bucket"),
      col("v").as("va"), col("n").as("na"))
    val b = e.select(col("vec_id").as("b"), col("label").as("label_b"),
      col("bucket").as("bucket_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("bucket") === col("bucket_b") && col("label") === col("label_b")
        && col("a") < col("b"))
      .select(col("a"), col("b"), col("label"),
        when(col("na") > 0 && col("nb") > 0,
          VectorOps.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("sim"))
      .orderBy(desc("sim"), asc("a"), asc("b"))
      .limit(20)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "simsearch_topk" -> (topK _),
    "simsearch_bucketed" -> (topKBucketed _),
    "neardup_embedding" -> (nearDup _),
  )

  private val CastEmb = "SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings"

  /** DuckDB twin of [[signBucket]] (generated from the same SignBits). */
  private def bucketSql(v: String): String =
    (0 until SignBits)
      .map(i => s"(CASE WHEN $v[${i + 1}] > 0 THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")

  val oracle: Map[String, String] = Map(
    "simsearch_topk" ->
      s"""WITH e AS ($CastEmb),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e, q WHERE vec_id <> $QueryVecId
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "simsearch_bucketed" ->
      s"""WITH e AS (
         |  SELECT vec_id, v, ${bucketSql("v")} AS bucket
         |  FROM ($CastEmb) t),
         |q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = $QueryVecId)
         |SELECT vec_id, bucket, ${VectorOps.cosineSql("v", "qv")} AS sim
         |FROM e JOIN q ON bucket = qbucket
         |WHERE vec_id <> $QueryVecId
         |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "neardup_embedding" ->
      s"""WITH e AS (
         |  SELECT vec_id, label, v, ${bucketSql("v")} AS bucket
         |  FROM ($CastEmb) t)
         |SELECT x.vec_id AS a, y.vec_id AS b, x.label AS label,
         |  ${VectorOps.cosineSql("x.v", "y.v")} AS sim
         |FROM e x JOIN e y
         |  ON x.bucket = y.bucket AND x.label = y.label AND x.vec_id < y.vec_id
         |ORDER BY sim DESC, a, b LIMIT 20""".stripMargin,
  )
}
