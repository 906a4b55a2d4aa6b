package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k highest-scoring (id, score) pairs,
  * ties broken by ascending id.
  *
  * A user-facing `Aggregator` (SURVEY §2.B "UDAF registration"): the
  * buffer is bounded at k entries, so the partial-aggregation pattern
  * applies — each map task reduces its partition to k rows before the
  * shuffle, which is what makes per-query top-k over a 100 TB corpus a
  * cheap aggregation rather than a global sort. */
final case class ScoredId(n_id: Long, score: Double)

class TopKByScore(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  // buffer invariant: sorted by (-score, n_id), length <= k
  private def beats(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.n_id < b.n_id)

  private def insert(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] = {
    val i = buf.indexWhere(beats(in, _))
    val at = if (i < 0) buf.length else i
    (buf.take(at) :+ in) ++ buf.drop(at)
  }

  private def best(xs: Seq[ScoredId]): Seq[ScoredId] =
    xs.sortBy(s => (-s.score, s.n_id)).take(k)

  override def zero: Seq[ScoredId] = Seq.empty

  /** O(1) reject for rows worse than the current k-th; O(k) insert
    * otherwise — per-row re-sorts would dominate at large group sizes. */
  override def reduce(buf: Seq[ScoredId], in: ScoredId): Seq[ScoredId] =
    if (buf.length < k) insert(buf, in)
    else if (beats(in, buf.last)) insert(buf, in).take(k)
    else buf

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = best(a ++ b)
  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r
  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
