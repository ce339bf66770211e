package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored row inside the top-k buffer: (score, tie-breaking id). */
case class Scored(score: Double, id: Long)

/** Bounded buffer — a case-class wrapper so `Encoders.product` applies
  * (a bare Seq has no public Encoders entry point). Held sorted by
  * (score desc, id asc), never longer than k. */
case class TopBuf(items: Seq[Scored])

/** Bounded-heap top-k per group — the scale-correct alternative to the
  * window formulation (`win_topk_group`): `row_number().over(...)` must
  * SORT every row of every group after shuffling all of them, while this
  * Aggregator keeps a k-element buffer per group in the PARTIAL
  * aggregation, so at most k rows per (group, input partition) ever
  * cross the exchange. At 100 TB with k=3 that is the difference between
  * shuffling the whole fact table and shuffling ~k·groups rows. merge is
  * associative + commutative (merge-sort of two sorted bounded buffers),
  * so Spark plans the standard 2-phase ObjectHashAggregate. Determinism:
  * ties break by ascending id, making the surviving set and its order
  * independent of partitioning. */
case class TopK(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
  // fail at definition time: k <= 0 otherwise surfaced as an opaque
  // NoSuchElementException (s.last on Nil) inside the first reduce task
  require(k > 0, s"TopK requires k > 0, got $k")
  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortWith(lt).take(k)
  def zero: TopBuf = TopBuf(Nil)
  def reduce(b: TopBuf, x: Scored): TopBuf = {
    val s = b.items
    // fast path: buffer full and x is weaker than the current floor
    if (s.size >= k && !lt(x, s.last)) b else TopBuf(trim(s :+ x))
  }
  def merge(a: TopBuf, b: TopBuf): TopBuf = TopBuf(trim(a.items ++ b.items))
  def finish(b: TopBuf): TopBuf = b
  def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
}
