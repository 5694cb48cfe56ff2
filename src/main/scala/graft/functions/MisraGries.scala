package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012): a bounded
  * `capacity`-entry counter map over a stream of terms whose candidate
  * set is guaranteed to contain EVERY term with true frequency
  * > N/(capacity+1), regardless of partition order or merge order —
  * and the guarantee composes across independently-built summaries
  * merged with [[MisraGries.mergeCounts]], which is what lets a
  * persisted sketch absorb per-batch sketches incrementally
  * (Quality.heavyHittersIncrement) without ever revisiting old data.
  *
  * The summary alone gives under-counts; graft uses it only as the
  * bounded-memory CANDIDATE stage of Quality.heavyHittersExact — a
  * second pass counts candidates exactly and applies the support
  * threshold to exact counts, so the operator's OUTPUT is exact and
  * deterministic even though the intermediate sketch is not unique.
  * (Same sketch-prefilter + exact-confirm shape as
  * [[BloomFilter]]/decontaminateBloomKeep.)
  */
class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], term: String): Map[String, Long] =
    buf.get(term) match {
      case Some(n) => buf.updated(term, n + 1L)
      case None if buf.size < capacity => buf.updated(term, 1L)
      // full and unseen: decrement every counter (the classic MG step);
      // zeros fall out, freeing slots for later terms
      case None => buf.collect { case (k, v) if v > 1L => k -> (v - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    MisraGries.mergeCounts(a, b, capacity)

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf
  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {

  /** The mergeable-summaries combine rule: sum the counter maps, then
    * subtract the (capacity+1)-th largest count from all — entries at
    * or below the pivot drop out, preserving both the size bound and
    * the N/(capacity+1) error bound for the COMBINED stream. Pure, so
    * the distributed aggregator and the batch-boundary sketch merge
    * use the identical rule.
    */
  def mergeCounts(
      a: Map[String, Long], b: Map[String, Long], capacity: Int): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    if (summed.size <= capacity) summed
    else {
      val pivot = summed.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.collect { case (k, v) if v - pivot > 0L => k -> (v - pivot) }
    }
  }

  /** DataFrame-callable summary aggregate over a string column;
    * returns the bounded (term -> residual count) map.
    */
  def counts(capacity: Int): Column => Column = {
    require(capacity >= 1, s"capacity must be >= 1: $capacity")
    val fn = udaf(new MisraGriesAggregator(capacity), Encoders.STRING)
    term => fn(term)
  }
}
