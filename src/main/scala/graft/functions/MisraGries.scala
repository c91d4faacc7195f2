package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary: parallel word/count arrays,
  * never more than k entries. Product-encoded (no kryo blobs).
  */
case class MGBuf(words: Array[String], counts: Array[Long])

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
  */
class MisraGries(k: Int) extends Aggregator[Row, MGBuf, MGBuf] {

  def zero: MGBuf = MGBuf(Array.empty, Array.empty)

  def reduce(b: MGBuf, r: Row): MGBuf = {
    if (r.isNullAt(0)) return b
    val w = r.getString(0)
    val i = b.words.indexOf(w)
    if (i >= 0) {
      val c = b.counts.clone(); c(i) += 1
      MGBuf(b.words, c)
    } else if (b.words.length < k) {
      MGBuf(b.words :+ w, b.counts :+ 1L)
    } else {
      // Full and unseen: decrement everyone, drop zeros (the classic
      // k-way cancellation step; the new item is cancelled against them).
      val kept = b.words.zip(b.counts).collect {
        case (word, c) if c > 1 => (word, c - 1)
      }
      MGBuf(kept.map(_._1), kept.map(_._2))
    }
  }

  def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val combined = (a.words.zip(a.counts) ++ b.words.zip(b.counts))
      .groupBy(_._1).map { case (w, ps) => (w, ps.map(_._2).sum) }.toArray
    if (combined.length <= k) pack(combined)
    else {
      // Subtract the (k+1)-th largest count; only entries strictly above
      // it survive, and there are at most k of those.
      val cut = combined.map(_._2).sortBy(-_).apply(k)
      pack(combined.collect { case (w, c) if c > cut => (w, c - cut) })
    }
  }

  /** Deterministic layout so equal summaries are array-equal too. */
  private def pack(entries: Array[(String, Long)]): MGBuf = {
    val sorted = entries.sortBy { case (w, c) => (-c, w) }
    MGBuf(sorted.map(_._1), sorted.map(_._2))
  }

  def finish(b: MGBuf): MGBuf = pack(b.words.zip(b.counts))

  def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
