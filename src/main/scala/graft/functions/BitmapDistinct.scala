package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** E-UDAF scale path: EXACT distinct counting over a dense integer key
  * domain via a fixed-width bitmap — the technique that replaces
  * `count(DISTINCT k)`'s Expand + re-shuffle with a plain aggregate when
  * keys are bounded ints (user ids, device ids, enum codes).
  *
  * `count(DISTINCT)` moves every (group, key) pair through the exchange;
  * this buffer is a CONSTANT `maxId/8` bytes per group regardless of row
  * count, merges with bitwise OR (commutative monoid → full map-side
  * combine), and finishes with a popcount. At 100 TB the exchange
  * carries |groups| fixed-size blobs instead of the fact table's key
  * stream — the exact-count sibling of the HLL sketch (q_approx_distinct)
  * for domains small enough to hold exactly.
  *
  * Out-of-domain ids fail fast (a silent mask would undercount). */
class BitmapDistinct(maxId: Int) extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = new Array[Long]((maxId >>> 6) + 1)

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    // NullSentinel = a NULL key at the call site (the udaf's primitive
    // input encoder cannot carry null itself): skipped, exactly as
    // count(DISTINCT) ignores nulls — the oracle this aggregator must
    // match. Everything else out of domain still fails fast.
    if (id == BitmapDistinct.NullSentinel) return buf
    require(id >= 0 && id <= maxId, s"id $id outside bitmap domain [0, $maxId]")
    buf((id >>> 6).toInt) |= 1L << (id & 63)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object BitmapDistinct {
  /** Call-site stand-in for a NULL key (`coalesce(k, NullSentinel)`):
    * reduce skips it, matching count(DISTINCT)'s null handling. */
  val NullSentinel: Long = Long.MinValue

  def apply(maxId: Int): BitmapDistinct = new BitmapDistinct(maxId)
}
