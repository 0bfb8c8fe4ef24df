package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** MISRA-GRIES frequent-items sketch as a typed `Aggregator` — the
  * heavy-hitters member of the sketch family (beside the HLL distinct and
  * mergeable quantile partials): a bounded `capacity`-counter summary of a
  * token stream whose guarantee makes a TWO-PASS EXACT top-k possible
  * without ever shuffling the full vocabulary (operator q_agg_heavyhitters;
  * re-derived from the published algorithm — Misra & Gries 1982, with the
  * mergeable-summaries combine rule of Agarwal et al., PODS 2012).
  *
  * Per-partition behavior (classic MG): a present token increments its
  * counter; an absent token inserts while capacity remains, else EVERY
  * counter decrements by one (zeros evicted — the incoming token's +1
  * cancels against its own decrement, so it is not inserted). Merge
  * (Agarwal et al.): sum counter maps, then if over capacity subtract the
  * (capacity+1)-th largest count from all and drop the non-positive —
  * at most `capacity` survive, and the summary stays mergeable in any
  * order/shape (partial aggregation, tree merge, shuffle).
  *
  * The load-bearing guarantee, computable FROM the summary itself:
  * for every token x, `est(x) ≤ true(x) ≤ est(x) + err` where
  * `err = (N − S) / (capacity + 1)` (N = total stream weight, S = the
  * summary's surviving counter mass) — in particular any token ABSENT
  * from the summary has true count ≤ err. StatsSpec verifies the bound
  * empirically against exact counts across partitionings.
  *
  * Scale shape: the buffer is a bounded map that merges map-side, so the
  * shuffle carries ONE ≤capacity-entry row per partition — the vocabulary
  * (unbounded at 100 TB) never rides an exchange.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < capacity => b.updated(x, 1L)
      case None =>
        // Decrement-all evicts every current singleton at once, so the
        // O(capacity) pass amortizes: each unit of decremented mass was
        // inserted by exactly one earlier reduce.
        b.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // Subtract the (capacity+1)-th largest count; at most `capacity`
      // entries can exceed it, and the subtracted mass rides the same
      // (N − S)/(capacity+1) error ledger as reduce's decrements.
      val t = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.flatMap { case (k, c) => if (c > t) Some(k -> (c - t)) else None }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object FreqSketch {
  /** Column form: MG summary (map<string,bigint>) of a string column. */
  def misraGries(c: Column, capacity: Int): Column =
    udaf(new MisraGries(capacity)).apply(c)
}
