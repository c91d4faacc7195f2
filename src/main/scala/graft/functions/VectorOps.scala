package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(DoubleType)` columns built from pure
  * Catalyst expressions (`zip_with`/`aggregate`) — no UDF, so the whole
  * computation stays inside whole-stage codegen and is usable verbatim on
  * a 1000-executor cluster.
  *
  * Determinism contract (DuckDB-oracle parity): every reduction is a LEFT
  * FOLD in element-index order, and cosine is written exactly as
  * `dot / (sqrt(dot_aa) * sqrt(dot_bb))`. The oracle SQL mirrors the same
  * shape (`list_sum(list_transform(...))`, same normalization order), so
  * double results are bit-identical between engines.
  */
object VectorOps {

  /** Σ a(i)*b(i), left-fold in index order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0-vectors yield null (0/0), callers filter. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** DuckDB twin of [[dot]] for oracle SQL: same left-fold order. */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))"

  /** DuckDB twin of [[cosine]]. */
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"
}
