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
  * minima) re-quadratizes the bucket. Standard LSH practice caps the
  * bucket: buckets larger than `maxBucket` are DROPPED from pair
  * enumeration — a bucket that saturated the cap carries almost no
  * discriminating power anyway (its members collide on one band of a
  * k-band sketch; true near-dup families that large will still meet in
  * their other, smaller bands). The drop is deterministic (exact bucket
  * count), so the DuckDB oracles mirror it with the same HAVING bound;
  * [[oversizedBuckets]] is the loud counter — pipelines surface it as a
  * QA row rather than silently skipping (registered as
  * q_dedup_lsh_bucket_profile).
  */
object LshBandJoin {

  /** Buckets above this size are excluded from pair enumeration (and
    * reported by [[oversizedBuckets]]). 1024 bounds per-bucket memory
    * at ~8 KB of ids and pair fan-out at ~524k pairs — generous for a
    * real near-dup family, tiny for an executor.
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
    *                  are dropped (see class doc)
    * @return distinct (<idCol>_a, <idCol>_b) candidate pairs with a < b
    */
  def candidatePairs(bands: DataFrame, idCol: String,
                     maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val (a, b) = (s"${idCol}_a", s"${idCol}_b")
    bucketIds(bands, idCol)
      .where(size(col("ids")).between(2, maxBucket))
      .select(explode(orderedPairs(col("ids"))).as("p"))
      .select(col("p.a").as(a), col("p.b").as(b))
      .distinct()
  }

  /** The loud counter for the hot-bucket guard: every band bucket the
    * cap would drop, with its size. Empty on healthy corpora; a QA
    * plane surfaces non-empty results instead of letting the cap hide
    * recall loss.
    */
  def oversizedBuckets(bands: DataFrame, idCol: String,
                       maxBucket: Int = DefaultMaxBucket): DataFrame =
    bucketIds(bands, idCol)
      .select(col("band_key"), size(col("ids")).as("bucket_size"))
      .where(col("bucket_size") > maxBucket)
}
