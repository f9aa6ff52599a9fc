package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored row inside the aggregator. */
case class Scored(score: Double, id: Long)

/** E-UDAF + E-TOPK scale path: per-group top-k as a typed `Aggregator`
  * with a bounded buffer (SURVEY §2.3 E-UDAF; reference `.topk`
  * `main.py:80-81`).
  *
  * Versus the window `row_number() <= k` formulation (q_win_topk), the
  * aggregator's partial-merge tree keeps only k rows per group per
  * partition — map-side combine shrinks the shuffle to O(groups × k)
  * instead of moving every row to its group's reducer and sorting there.
  * At 100 TB that is the difference between shuffling the fact table and
  * shuffling a sketch of it.
  *
  * Ordering: score desc, id asc (the NMS/topk deterministic tie-break).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  // k ≤ 0 would reach `buf.last` on an empty buffer at aggregation time
  // on an executor — fail at construction with the real cause instead
  require(k > 0, s"TopKAggregator needs k > 0, got $k")

  private val ord: Ordering[Scored] = Ordering.by(s => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.length < k) (buf :+ a).sorted(ord)
    else if (ord.lt(a, buf.last)) (buf.init :+ a).sorted(ord)
    else buf

  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  def apply(k: Int): TopKAggregator = new TopKAggregator(k)
}
