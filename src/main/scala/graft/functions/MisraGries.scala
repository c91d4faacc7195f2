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

  def merge(a: MGAcc, b: MGAcc): MGAcc = {
    val (small, large) = if (a.m.size < b.m.size) (a.m, b.m) else (b.m, a.m)
    val combined = small.foldLeft(large) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (combined.size <= k) MGAcc(combined)
    else {
      // Subtract the (k+1)-th largest count; only entries strictly above
      // it survive, and there are at most k of those.
      val cut = combined.valuesIterator.toArray.sortBy(-(_: Long)).apply(k)
      MGAcc(combined.collect { case (w, c) if c > cut => (w, c - cut) })
    }
  }

  /** Deterministic layout so equal summaries are array-equal too. */
  def finish(b: MGAcc): MGBuf = {
    val sorted = b.m.toArray.sortBy { case (w, c) => (-c, w) }
    MGBuf(sorted.map(_._1), sorted.map(_._2))
  }

  def bufferEncoder: Encoder[MGAcc] = Encoders.product[MGAcc]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
