package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator for similarity search: partial
  * aggregation keeps at most k candidates per partition and merge
  * combines bounded buffers — an alternative physical strategy to the
  * rank-window form (WindowGroupLimit) with the same semantics
  * (ordered by cosine desc, vec_id tiebreak, trimmed to exactly k).
  *
  * SURVEY §7.3: the one place typed-aggregate machinery appears.
  */
object TopKAggregator {

  case class Scored(q_id: Long, vec_id: Long, cosine: Double)

  class TopKByCosine(k: Int, bufEnc: Encoder[Seq[Scored]])
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    private def trim(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.cosine, s.vec_id)).take(k)

    override def zero: Seq[Scored] = Nil
    override def reduce(buf: Seq[Scored], s: Scored): Seq[Scored] = trim(buf :+ s)
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = trim(a ++ b)
    override def finish(buf: Seq[Scored]): Seq[Scored] = buf
    override def bufferEncoder: Encoder[Seq[Scored]] = bufEnc
    override def outputEncoder: Encoder[Seq[Scored]] = bufEnc
  }
}
