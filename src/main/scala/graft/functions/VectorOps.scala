package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(DoubleType)` columns built from pure
  * Catalyst expressions (`zip_with`/`aggregate`) — no UDF, so the whole
  * computation stays inside whole-stage codegen and is usable verbatim on
  * a 1000-executor cluster.
  *
  * Determinism contract (DuckDB-oracle parity): every reduction is a LEFT
  * FOLD in element-index order over DOUBLE elements, and cosine is
  * written exactly as `dot / (sqrt(dot_aa) * sqrt(dot_bb))`. The oracle
  * SQL twins mirror the same shape, so results are bit-identical between
  * engines ON THE GUARDED DOMAIN: equal-length non-empty double arrays,
  * non-zero norms for cosine. Outside that domain both sides return NULL
  * by construction (the engines' native edge behaviors differ: e.g.
  * Spark's `aggregate` over an empty array returns the 0.0 seed while
  * DuckDB's `list_sum` returns NULL, and 0/0 is NULL in non-ANSI Spark
  * but IEEE NaN in DuckDB — the guards make those paths unreachable).
  * Callers must cast FloatType arrays to double on BOTH engines before
  * comparing (float arithmetic orders/widens differently).
  */
object VectorOps {

  private def sameShape(a: Column, b: Column): Column =
    size(a) === size(b) && size(a) > 0

  /** Σ a(i)*b(i), left-fold in index order; null unless the arrays are
    * equal-length and non-empty. Backed by the native [[ArrayDot]]
    * expression (one fused codegen loop); [[dotHof]] is the built-in
    * higher-order-function formulation it is property-tested
    * bit-identical to.
    */
  def dot(a: Column, b: Column): Column = ArrayDot(a, b)

  /** The HOF reference formulation of [[dot]] (ZipWith/ArrayAggregate are
    * CodegenFallback — correct but per-element interpreted; kept as the
    * spec baseline the native expression must match bit-for-bit).
    */
  def dotHof(a: Column, b: Column): Column =
    when(sameShape(a, b),
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v))
      .otherwise(lit(null).cast("double"))

  /** Euclidean norm (null for empty arrays). */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null for shape mismatches and zero-norm vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na > 0 && nb > 0, d / (na * nb)).otherwise(lit(null).cast("double"))
  }

  /** DuckDB twin of [[dot]]: same guard, same left-fold order. */
  def dotSql(a: String, b: String): String =
    s"""CASE WHEN len($a) = len($b) AND len($a) > 0
       | THEN list_sum(list_transform(range(1, len($a)+1), i -> $a[i] * $b[i]))
       | END""".stripMargin.replace("\n", "")

  /** DuckDB twin of [[cosine]]: same guards, same normalization order. */
  def cosineSql(a: String, b: String): String = {
    val na = s"sqrt(${dotSql(a, a)})"
    val nb = s"sqrt(${dotSql(b, b)})"
    s"(CASE WHEN $na > 0 AND $nb > 0 THEN ${dotSql(a, b)} / ($na * $nb) END)"
  }
}
