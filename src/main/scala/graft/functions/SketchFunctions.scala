package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own Bloom-filter expressions (the pair
  * that powers Catalyst's runtime row-group filtering) so library code
  * can build and probe a Bloom sketch explicitly.
  *
  * The 100 TB decontamination pattern: when the benchmark/blocklist side
  * is too large to broadcast as rows, aggregate it into a Bloom filter
  * (bits, not rows), ship the ONE binary blob to every task as a
  * literal — exactly how Catalyst injects runtime filters — and
  * prefilter the corpus map-side. Survivors (true hits + the configured
  * false-positive fraction) then exact-confirm through a plain shuffle
  * join whose left side is now a tiny fraction of the corpus. No false
  * negatives, so the composed result is exact.
  */
object SketchFunctions {

  /** Aggregate: Bloom filter (as BINARY) over a LONG column.
    * `numBits` bounds the blob size: numBits/8 bytes (~10 bits/item
    * gives ~1% false positives). Stay under Spark's 64M-bit runtime
    * filter cap so driver/executor shipping stays metadata-sized.
    */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    GraftColumnBridge.column(
      new BloomFilterAggregate(GraftColumnBridge.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Predicate: membership probe of a LONG column against a collected
    * Bloom blob, shipped as a literal (task-broadcast with the closure —
    * the scalar-subquery shape Catalyst's own runtime filter uses).
    */
  def mightContain(bloomBlob: Array[Byte], c: Column): Column =
    GraftColumnBridge.column(
      BloomFilterMightContain(Literal(bloomBlob, BinaryType),
        GraftColumnBridge.expression(c)))
}
