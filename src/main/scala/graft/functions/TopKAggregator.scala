package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (the engine's `Aggregator[IN, BUF, OUT]`
  * surface): exact top-k heavy hitters — per group, the k most frequent
  * strings with their counts, ties broken by string ascending.
  *
  * The buffer is a full count map, merged associatively — exact, so the
  * DuckDB oracle can reproduce it with a plain count + rank. At 100 TB
  * the buffer is bounded by per-group vocabulary; for unbounded domains
  * the same class swaps in a SpaceSaving (capped-capacity) buffer at the
  * cost of approximation — kept exact here because the correctness gate
  * hashes values.
  *
  * Output is a deterministic, pre-sorted array of "token:count" strings
  * (string-encoded to keep the aggregate's schema simple and
  * hash-stable).
  */
class TopKAggregator(k: Int) extends Aggregator[String, Map[String, Long], Seq[String]] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (t, c)) => acc.updated(t, acc.getOrElse(t, 0L) + c) }
  }

  override def finish(b: Map[String, Long]): Seq[String] =
    b.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)
      .map { case (t, c) => s"$t:$c" }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
