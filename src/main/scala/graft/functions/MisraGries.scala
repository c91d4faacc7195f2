package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary: parallel word/count arrays,
  * never more than k entries. Product-encoded (no kryo blobs).
  */
case class MGBuf(words: Array[String], counts: Array[Long])

/** Misra-Gries accumulation state: candidate → (under-)count as a plain
  * map, so the hot path (a token already in the summary) is a hash
  * lookup + persistent-map update, not an O(k) array scan. Packed to
  * the parallel-array [[MGBuf]] only at the output boundary; `udaf`
  * wraps the Aggregator as a ScalaAggregator (TypedImperativeAggregate),
  * so the buffer lives as this object between updates and the encoder
  * runs only at partial-aggregate boundaries.
  */
case class MGAcc(m: Map[String, Long])

/** Bounded-memory heavy-hitter candidates as a typed `Aggregator` — the
  * Misra-Gries summary with the standard mergeable-summaries merge
  * (combine counts, then subtract the (k+1)-th largest so at most k
  * survive). State is O(k) per partition regardless of vocabulary or
  * corpus size, and partial summaries merge associatively map-side.
  *
  * Guarantee (the reason a SECOND exact pass can be trusted): an item
  * with true count > N/(k+1) always survives to the final summary, so
  * for a support threshold φ, any k >= ceil(1/φ) - 1 makes the candidate
  * set a SUPERSET of the true φ-heavy hitters. Candidate counts are
  * UNDER-estimates (decrements), which is why the exact verify pass —
  * not the summary counts — produces the reported numbers.
  *
  * Per-token cost is O(1) amortized: the hit path is one hash lookup,
  * and the k-way cancellation below, though O(k) per event, destroys
  * k+1 units of count mass while each token only ever adds 1 — so
  * cancellations happen at most N/(k+1) times per partition.
  */
class MisraGries(k: Int) extends Aggregator[Row, MGAcc, MGBuf] {

  def zero: MGAcc = MGAcc(Map.empty)

  def reduce(b: MGAcc, r: Row): MGAcc = {
    if (r.isNullAt(0)) return b
    val w = r.getString(0)
    b.m.get(w) match {
      case Some(c) => MGAcc(b.m.updated(w, c + 1))
      case None if b.m.size < k => MGAcc(b.m.updated(w, 1L))
      case None =>
        // Full and unseen: decrement everyone, drop zeros (the classic
        // k-way cancellation step; the new item is cancelled against them).
        MGAcc(b.m.collect { case (word, c) if c > 1 => (word, c - 1) })
    }
  }

  def merge(a: MGAcc, b: MGAcc): MGAcc =
    MGAcc(MisraGries.mergeMaps(a.m, b.m, k))

  /** Deterministic layout so equal summaries are array-equal too. */
  def finish(b: MGAcc): MGBuf = MisraGries.pack(b.m)

  def bufferEncoder: Encoder[MGAcc] = Encoders.product[MGAcc]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}

object MisraGries {

  /** The mergeable-summaries merge (Agarwal et al., "Mergeable
    * Summaries"): combine counts, then subtract the (k+1)-th largest
    * count; only entries strictly above it survive, and there are at
    * most k of those. Shared by the in-aggregation merge above and the
    * FINISHED-summary merge below, so the two cannot drift.
    */
  def mergeMaps(a: Map[String, Long], b: Map[String, Long], k: Int): Map[String, Long] = {
    val (small, large) = if (a.size < b.size) (a, b) else (b, a)
    val combined = small.foldLeft(large) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      val cut = combined.valuesIterator.toArray.sortBy(-(_: Long)).apply(k)
      combined.collect { case (w, c) if c > cut => (w, c - cut) }
    }
  }

  /** Deterministic (-count, word) layout shared by finish() and
    * [[mergeBufs]].
    */
  def pack(m: Map[String, Long]): MGBuf = {
    val sorted = m.toArray.sortBy { case (w, c) => (-c, w) }
    MGBuf(sorted.map(_._1), sorted.map(_._2))
  }

  /** Merge two FINISHED summaries — the incremental-maintenance step:
    * history's PERSISTED O(k) summary merges with each batch's without
    * re-scanning history, and the merged error stays ≤ N_total/(k+1)
    * (mergeability is the theorem; the spec pins the band).
    */
  def mergeBufs(a: MGBuf, b: MGBuf, k: Int): MGBuf =
    pack(mergeMaps(a.words.zip(a.counts).toMap, b.words.zip(b.counts).toMap, k))
}
