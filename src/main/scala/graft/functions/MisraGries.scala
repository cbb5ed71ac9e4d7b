package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitters summary — the frequent-items
  * sibling of the HLL (distinct) and KLL (quantile) sketch rollups: a
  * bounded map of at most k (item -> counter) entries per group, merged
  * across partitions and across groups without re-reading raw data.
  *
  * Deterministic guarantee (Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012): after summarizing
  * a stream of n items,
  *  - every item with true frequency > n/(k+1) IS in the summary, and
  *  - every stored counter undercounts by at most n/(k+1)
  *    (est <= exact <= est + n/(k+1)).
  * Unlike the probabilistic sketches there is no failure probability —
  * q_agg_heavy_hitters asserts the bound as a hard invariant.
  *
  * At 100 TB this is the only sane shape for "top items by frequency"
  * when the item domain is unbounded (tokens, URLs, user agents): the
  * per-partition state is k counters regardless of input size, the
  * merge is k-bounded, and the full exact group-by over the domain —
  * the thing the sketch replaces — never runs.
  */
object MisraGries {

  /** Mergeable combine: sum counters, and if more than k survive,
    * subtract the (k+1)-th largest counter from all and drop the
    * non-positive — the total decrement stays <= n/(k+1) across any
    * merge tree (Agarwal et al. 2012, Lemma 1).
    */
  def combine(k: Int, a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val sum = b.foldLeft(a) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.collect { case (i, c) if c > d => i -> (c - d) }
    }
  }

  /** Streaming aggregator over raw rows (partial aggregation holds k
    * counters per partition; merge is [[combine]]); `item` extracts the
    * counted key from the grouped element.
    */
  class HeavyHitters[I](k: Int, item: I => Long,
                        bufEnc: Encoder[Map[Long, Long]])
      extends Aggregator[I, Map[Long, Long], Map[Long, Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(m: Map[Long, Long], row: I): Map[Long, Long] = {
      val x = item(row)
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1)
        case None if m.size < k => m.updated(x, 1L)
        // classic decrement step: an unseen item with a full summary
        // decrements every counter (dropping zeros) — O(k), k constant
        case None => m.collect { case (i, c) if c > 1 => i -> (c - 1) }
      }
    }
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      combine(k, a, b)
    override def finish(m: Map[Long, Long]): Map[Long, Long] = m
    override def bufferEncoder: Encoder[Map[Long, Long]] = bufEnc
    override def outputEncoder: Encoder[Map[Long, Long]] = bufEnc
  }

  /** Rollup aggregator over ALREADY-BUILT summaries (the hll_union /
    * kll_merge analog): merges per-group summaries to a coarser scope
    * without touching raw data.
    */
  class MergeSummaries(k: Int, bufEnc: Encoder[Map[Long, Long]])
      extends Aggregator[Map[Long, Long], Map[Long, Long], Map[Long, Long]] {
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(m: Map[Long, Long], x: Map[Long, Long]): Map[Long, Long] =
      combine(k, m, x)
    override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      combine(k, a, b)
    override def finish(m: Map[Long, Long]): Map[Long, Long] = m
    override def bufferEncoder: Encoder[Map[Long, Long]] = bufEnc
    override def outputEncoder: Encoder[Map[Long, Long]] = bufEnc
  }
}
