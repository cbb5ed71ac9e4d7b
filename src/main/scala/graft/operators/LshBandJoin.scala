package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LSH candidate-pair primitive shared by every bucketed near-dup /
  * ANN path (MinHash bands over shingles, hyperplane bands over
  * embeddings): group the (id, band_key) table by band key and emit the
  * ordered id pairs within each bucket, then dedup across bands. The
  * band key is the ONLY shuffle key over the big side, so work
  * distributes by bucket at any scale.
  *
  * Plan shape: ONE shuffle (the band-key group-by) instead of the
  * self-join form's two scans + two shuffle sides — the upstream
  * sketch/minhash expression is evaluated once, and pair enumeration
  * happens post-shuffle inside codegen (array_sort + slice/transform,
  * no second explode). Pair count per bucket is n(n-1)/2, so memory per
  * group and output size are both bounded by [[DefaultMaxBucket]].
  *
  * Hot-bucket guard: a band key shared by a near-dup-DENSE family (or
  * a degenerate band — e.g. every short doc hashing to the same two
  * minima) re-quadratizes the bucket. Buckets larger than `maxBucket`
  * degrade to STAR enumeration: every member pairs with the bucket's
  * minimum id only (n-1 edges instead of n(n-1)/2), so per-bucket
  * fan-out is linear above the cap while the bucket stays CONNECTED —
  * the candidate graph's connected components (what dedup keep-sets
  * derive from) are exactly those of full enumeration, a graph fact
  * LshBandJoinSpec proves empirically. r12 DROPPED hot buckets instead,
  * arguing oversized-bucket pairs re-meet in other, smaller bands; the
  * r13 recall A/B measured that claim at 10% pair recall on a dense
  * 80-member near-dup family — star degradation replaced the drop. The
  * degradation is deterministic (exact bucket count + min id), so the
  * DuckDB oracles mirror it with the same bound; [[oversizedBuckets]]
  * is the loud counter — pipelines surface it as a QA row (registered
  * as q_dedup_lsh_bucket_profile) because pair-LEVEL candidates above
  * the cap are still reduced (n-1 of n(n-1)/2), even though component-
  * level recall is preserved.
  */
object LshBandJoin {

  /** Buckets above this size degrade to star enumeration (and are
    * reported by [[oversizedBuckets]]). 1024 bounds full-enumeration
    * fan-out at ~524k pairs per bucket — generous for a real near-dup
    * family, tiny for an executor; above it the star keeps fan-out
    * linear in bucket size.
    */
  val DefaultMaxBucket = 1024

  private def bucketIds(bands: DataFrame, idCol: String): DataFrame =
    bands.groupBy(col("band_key"))
      .agg(array_sort(collect_set(col(idCol))).as("ids"))

  /** Ordered-pair enumeration over a SORTED array column, entirely in
    * codegen (array_sort upstream + slice/transform here — no second
    * explode, no self-join): element i pairs with every later element,
    * yielding exactly the a < b pairs as `struct(a, b)`. Shared by the
    * band-bucket pair join and any other grouped pair fan-out (e.g. the
    * source-overlap matrix groups by fingerprint and explodes source
    * pairs with this).
    */
  def orderedPairs(sortedIds: Column): Column =
    flatten(transform(sortedIds, (x, i) =>
      transform(slice(sortedIds, i + lit(2), size(sortedIds)),
        y => struct(x.as("a"), y.as("b")))))

  /** @param bands (id, band_key) rows, one per item per band
    * @param idCol name of the id column in `bands`
    * @param maxBucket hot-bucket cap; buckets with more distinct ids
    *                  degrade to star enumeration (see class doc).
    *                  DELIBERATELY no default: the degradation thins
    *                  pair-level candidates unless the caller also
    *                  surfaces [[oversizedBuckets]], so every call site
    *                  must state its cap (pass [[DefaultMaxBucket]]) and
    *                  own the companion probe.
    * @return distinct (<idCol>_a, <idCol>_b) candidate pairs with a < b
    */
  def candidatePairs(bands: DataFrame, idCol: String,
                     maxBucket: Int): DataFrame = {
    val (a, b) = (s"${idCol}_a", s"${idCol}_b")
    // ids is sorted, so element 1 is the bucket minimum: the star pairs
    // it with every later element — n-1 edges, same connectivity.
    val star: Column = transform(slice(col("ids"), lit(2), size(col("ids"))),
      y => struct(element_at(col("ids"), 1).as("a"), y.as("b")))
    bucketIds(bands, idCol)
      .where(size(col("ids")) >= 2)
      .select(explode(when(size(col("ids")) <= maxBucket,
        orderedPairs(col("ids"))).otherwise(star)).as("p"))
      .select(col("p.a").as(a), col("p.b").as(b))
      .distinct()
  }

  /** The loud counter for the hot-bucket guard: every band bucket the
    * cap degrades to star enumeration, with its size. Empty on healthy
    * corpora; a QA plane surfaces non-empty results instead of letting
    * the cap silently thin pair-level candidates.
    */
  def oversizedBuckets(bands: DataFrame, idCol: String,
                       maxBucket: Int): DataFrame =
    bucketIds(bands, idCol)
      .select(col("band_key"), size(col("ids")).as("bucket_size"))
      .where(col("bucket_size") > maxBucket)
}
