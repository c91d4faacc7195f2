package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins (SURVEY.md scale notes; the manual
  * complement to AQE's runtime skew-join splitting, for when a hot key
  * is known ahead of time or AQE is unavailable).
  *
  * Shape: the skewed (probe) side gets a pseudo-random salt in
  * [0, factor); the small (build) side is replicated `factor`× with
  * every salt value; the join key becomes (key, salt), so one hot key's
  * rows spread over `factor` shuffle partitions instead of one. Results
  * are identical to the plain join for any salt assignment, because
  * every probe row still meets every build row of its key exactly once.
  *
  * Cost model: build-side shuffle volume multiplies by `factor` — use
  * only when the build side is small (but too big to broadcast, else
  * just broadcast) and the probe side has hot keys.
  */
object Salt {

  private val SaltCol = "__graft_salt"

  /** Equi-join `skewed ⋈ small` on `skewed(key) = small(smallKey)`,
    * salted `factor` ways. Output columns = the plain join's.
    */
  def saltedJoin(skewed: DataFrame, small: DataFrame,
      key: String, smallKey: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    // Any row→salt assignment is correct; hashing the whole row spreads
    // a hot key's rows without needing a random (non-deterministic) seed.
    val probe = skewed.withColumn(SaltCol,
      pmod(xxhash64(struct(skewed.columns.map(col).toIndexedSeq: _*)), lit(factor.toLong)))
    val build = small.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(factor.toLong - 1))))
    probe.join(build,
        probe(key) === build(smallKey) && probe(SaltCol) === build(SaltCol))
      .drop(SaltCol)
  }
}
