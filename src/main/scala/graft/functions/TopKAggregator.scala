package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (UDAF via `Aggregator`): bounded per-group
  * top-k by score.
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy)`
  * must shuffle and sort EVERY row of the group; this aggregator keeps a
  * k-bounded buffer per group, combines map-side, and ships only k rows
  * per group across the shuffle — the same reason global top-k uses
  * TakeOrdered. For k ≪ group size (the 100 TB shape) that's the
  * difference between sorting the lake and merging k-row buffers.
  *
  * Deterministic: orders by (score desc, event_id asc), so ties never
  * depend on partitioning.
  */
final case class UserEvent(user_id: Long, event_id: Long, value: Double)
final case class ScoredEvent(event_id: Long, value: Double)
final case class TopKBuffer(items: Seq[ScoredEvent])

class TopKByValue(k: Int)
  extends Aggregator[UserEvent, TopKBuffer, TopKBuffer] {

  private val ord: Ordering[ScoredEvent] =
    Ordering.by(e => (-e.value, e.event_id))

  override def zero: TopKBuffer = TopKBuffer(Vector.empty)

  override def reduce(b: TopKBuffer, e: UserEvent): TopKBuffer = {
    val item = ScoredEvent(e.event_id, e.value)
    val items = b.items
    // the buffer is kept sorted, so the common case — a full buffer and
    // an item worse than the current k-th — is an O(1) reject; otherwise
    // an O(k) sorted insert. Re-sorting per row would put an O(k log k)
    // sort on every input row of every group.
    if (items.length >= k && ord.compare(item, items.last) >= 0) b
    else {
      val idx = items.indexWhere(x => ord.compare(item, x) < 0)
      val pos = if (idx < 0) items.length else idx
      TopKBuffer(((items.take(pos) :+ item) ++ items.drop(pos)).take(k))
    }
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer =
    TopKBuffer((a.items ++ b.items).sorted(ord).take(k))

  override def finish(b: TopKBuffer): TopKBuffer =
    TopKBuffer(b.items.sorted(ord))

  override def bufferEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
  override def outputEncoder: Encoder[TopKBuffer] = Encoders.product[TopKBuffer]
}
