package graft.queries

import graft.Tables.t
import graft.multimodal.Multimodal
import graft.plans.Checkpoints.CutOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline over `documents`: text → opaque binary
  * payload column (+ metadata) → per-partition decode-stub feature
  * extraction (graft.multimodal.Multimodal). The oracle recomputes the
  * same deterministic features from the md5 hex digest in SQL, so the
  * whole binary round-trip (unhex → bytes → stats) is value-checked.
  */
object MultimodalQueries extends QueryPack {

  /** Silence cut for q_multimodal_audio_energy: a 4-sample frame of
    * uniform int16 noise has expected energy ~1.4e9, so 5e8 lands
    * mid-distribution — both verdicts occur at every SF.
    */
  private val SilenceThreshold = 500000000L

  private def media(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Multimodal.synthesize(
      t(s, dir, "documents")
        .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))
      .as[Multimodal.MediaRecord]
  }

  /** Perceptual near-dup knobs. Variants: every doc_id ≡ 3 (mod 7)
    * gets a "re-encoded" copy under doc_id + 1e9 whose payload byte 5
    * is bumped (+96 mod 256) — the decode-stub stand-in for a mild
    * re-compress. With the 80-byte decoded plane that byte feeds
    * exactly ONE dHash grid cell (cell 5 — two gradient comparisons),
    * so the copy lands at Hamming distance 0..2 from its original — a
    * true near-dup the byte-digest dedup (q_multimodal_dedup) cannot
    * see. (Geometry details in [[neardupPayloads]].)
    */
  private val VariantOffset = 1000000000L
  private val VariantMod = 7
  private val VariantRes = 3
  private val NearDupMaxHamming = 6
  /** Recall A/B subset: doc_id % 5 == 0. VariantOffset % 5 == 0, so a
    * subset doc's variant is in the subset too — the near-dup pairs
    * the A/B needs exist inside it at every SF.
    */
  private val RecallMod = 5

  /** dHash-vs-pHash robustness A/B subset (doc_id % 5 == 0) and the
    * three stub transform families it measures — each a per-byte map
    * of the 80-byte decoded plane, each standing in for a published
    * image-space perturbation:
    *  - reencode: byte 5 bumped +96 mod 256 (the near-dup fixture's
    *    mild re-compress — one grid cell moves);
    *  - levels:   every byte +8 clamped at 255 (a monotone intensity
    *    remap — brightness/levels). dHash is EXACTLY invariant under
    *    strictly monotone remaps (it compares neighbors);
    *  - dither:   alternate bytes +16/−16 clamped (per-pixel dither /
    *    requantization noise — the published dHash weakness: near-tie
    *    gradients flip, while pHash's low-frequency energy averages
    *    the alternation out).
    * Measured at the row's threshold (6): reencode ~100%/~97%
    * (dhash/phash), levels ~100%/~100%, dither ~37%/100% — the
    * complement is the artifact, measured, not assumed.
    */
  private val PhashAbMod = 5

  /** (doc_id, payload) for the near-dup rows: an 80-byte DECODED-PLANE
    * stand-in (5 chained md5 blocks of the text — the multimodal
    * decode stub at luma-plane size) plus the re-encoded variants.
    * 80 bytes matter: dHash's 72-cell grid needs ≥ 72 informative
    * values, or consecutive cells resample the same byte, the strict
    * gradient comparison zeroes most bits, and every pair of documents
    * lands within the Hamming threshold (measured: a 16-byte payload
    * leaves ~13 informative bits and ~40% of ALL pairs "near" — the
    * degenerate stub, not a usable fingerprint).
    *
    * The variant bump is +96 on byte 5: the byte feeds exactly one
    * grid cell (cell 5 — two gradient comparisons), so a variant sits
    * at Hamming distance 0..2 from its original with DIFFERENT payload
    * bytes — visible to dHash, invisible to the byte digest.
    */
  /** (base, variants) halves of the near-dup payload plane — split so
    * callers can filter EACH SIDE with a simple residue predicate
    * BEFORE the union (an OR-of-residues pushed through the union
    * reaches the scan untranslatable and kills pushdown — the
    * PlanLint rule that caught it).
    */
  private def neardupPayloadParts(s: org.apache.spark.sql.SparkSession,
                                  dir: String) = {
    val tx = coalesce(col("text"), lit(""))
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), concat(
        md5(tx), md5(concat(tx, lit("1"))), md5(concat(tx, lit("2"))),
        md5(concat(tx, lit("3"))), md5(concat(tx, lit("4")))).as("h"))
    val base = docs.select(col("doc_id"), unhex(col("h")).as("payload"))
    val bumped = concat(
      substring(col("h"), 1, 10),
      lpad(lower(hex(
        (conv(substring(col("h"), 11, 2), 16, 10).cast("long") + 96) % 256)),
        2, "0"),
      substring(col("h"), 13, 148))
    val variants = docs.where(col("doc_id") % VariantMod === VariantRes)
      .select(col("doc_id").as("orig_id"),
        (col("doc_id") + VariantOffset).as("doc_id"),
        unhex(bumped).as("payload"))
    (base, variants)
  }

  private def neardupPayloads(s: org.apache.spark.sql.SparkSession,
                              dir: String) = {
    val (base, variants) = neardupPayloadParts(s, dir)
    base.unionByName(variants.select(col("doc_id"), col("payload")))
  }

  /** (doc_id, h64) — the SQL-registered native kernel, exercised
    * through its SQL name (the q_text_fuzzy_distance discipline).
    */
  private def neardupHashes(s: org.apache.spark.sql.SparkSession,
                            dir: String) = {
    graft.functions.GraftExtensions.install(s)
    neardupPayloads(s, dir).selectExpr("doc_id", "dhash64(payload) AS h64")
  }

  /** Production banding: 4 x 16-bit bands — cheap (4 band rows/doc)
    * and pigeonhole-EXACT for Hamming distance <= 3; beyond that it is
    * approximate, which is what the recall A/B row measures.
    */
  private[graft] def bandKeys4(h: org.apache.spark.sql.Column) =
    array((0 until 4).map(k =>
      concat(lit(s"$k:"),
        shiftrightunsigned(h, 16 * k).bitwiseAND(lit(65535L))
          .cast("string"))): _*)

  /** Lossless banding for the exact baseline: 7 bands (10+6x9 bits) —
    * pigeonhole guarantees a shared band for every pair within
    * [[NearDupMaxHamming]] = 6 < 7 bits, so the "exact" side of the
    * A/B is itself an equi-join, never an all-pairs scan.
    */
  private val Band7Layout = Seq((0, 10), (10, 9), (19, 9), (28, 9),
    (37, 9), (46, 9), (55, 9))
  private def bandKeys7(h: org.apache.spark.sql.Column) =
    array(Band7Layout.zipWithIndex.map { case ((off, len), k) =>
      concat(lit(s"e$k:"),
        shiftrightunsigned(h, off).bitwiseAND(lit((1L << len) - 1))
          .cast("string"))
    }: _*)

  private[graft] def bandFrame(hs: org.apache.spark.sql.DataFrame,
                        keys: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    hs.select(col("doc_id"), explode(keys(col("h64"))).as("band_key"))

  private val mediaMemo =
    new SessionMemo[String, org.apache.spark.sql.DataFrame]()

  /** Bounded `band_key -> [(doc_id, h64)]` payload of a media-hash
    * index — the STATIC probe side of the streaming near-dup gate
    * (StreamingJobs.mediaNeardupStream): the arriving row joins 4 band
    * slots and verifies exact Hamming in place, stateless. Bucket
    * sizes are loudly bounded (the requireBoundedClusters discipline):
    * a degenerate constant-payload corpus would otherwise ship a
    * corpus-sized array per arriving row, and a silently-thinned
    * bucket would silently lose matches — refusal with the
    * prescription is the honest failure.
    */
  private[graft] def mediaBandPayload(
      hashes: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bands = bandFrame(hashes, bandKeys4)
    val cap = graft.operators.LshBandJoin.DefaultMaxBucket
    val worst = bands.groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      .agg(max(struct(col("n"), col("band_key"))).as("w"))
      .select(col("w.n"), col("w.band_key")).head()
    if (!worst.isNullAt(0) && worst.getLong(0) > cap)
      throw new IllegalStateException(
        s"media band bucket ${worst.get(1)} holds ${worst.getLong(0)} " +
          s"payloads (cap $cap) — a degenerate corpus (constant/near-" +
          "constant payloads); the probe would scan that bucket per " +
          "arrival. Repair the payload column or widen the bands; do " +
          "not raise the cap without sizing the per-arrival scan")
    bands.join(hashes, "doc_id")
      .groupBy(col("band_key"))
      .agg(collect_list(struct(col("doc_id"), col("h64"))).as("vs"))
  }

  /** The STREAM-SHAPED probe: arrivals (doc_id, h64) against the
    * [[mediaBandPayload]] table — 4 band-slot left joins + in-array
    * exact-Hamming verify and min-(hamming, doc_id) pick via array
    * HOFs. No window, no aggregation, no state: a streaming frame
    * runs it as-is in append mode, and the batch row's verdicts are
    * bit-identical (StreamingSpec pins stream ≡ batch).
    */
  private[graft] def mediaNeardupVerdicts(
      arrivals: org.apache.spark.sql.DataFrame,
      payload: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def ham(v: org.apache.spark.sql.Column) =
      bit_count(v.getField("h64").bitwiseXOR(col("h64"))).cast("long")
    val withBands = arrivals.withColumn("__bands", bandKeys4(col("h64")))
    val gated = (0 until 4).foldLeft(withBands) { (df, b) =>
      df.withColumn(s"__bk$b", get(col("__bands"), lit(b)))
        .join(payload.select(col("band_key").as(s"__bk$b"),
          col("vs").as(s"__vs$b")), Seq(s"__bk$b"), "left")
        .withColumn(s"__best$b", array_min(transform(
          filter(col(s"__vs$b"), v =>
            v.getField("doc_id") =!= col("doc_id")
              && ham(v) <= NearDupMaxHamming),
          v => struct(ham(v).as("hamming"),
            v.getField("doc_id").as("match_doc_id")))))
    }
    gated.withColumn("__best", array_min(filter(
        array((0 until 4).map(b => col(s"__best$b")): _*),
        x => x.isNotNull)))
      .select(col("doc_id"),
        col("__best").isNotNull.as("is_dup"),
        col("__best.match_doc_id").as("match_doc_id"),
        col("__best.hamming").as("hamming"))
  }

  /** The BATCH-SHAPED probe (the registered incremental row and the
    * warehouse face Orchestrator.mediaNeardupAgainstIndex): batch band
    * keys broadcast against the persisted index band TABLE — the index
    * is scanned once map-side and NEVER reshuffled per batch, so
    * per-ingest cost is O(batch x bucket) + one index scan, never
    * corpus². Verify and pick share the verdict contract with
    * [[mediaNeardupVerdicts]] (exact Hamming <= threshold, best =
    * min (hamming, doc_id)); an oversized index bucket REFUSES in-plan
    * (the q_multimodal_neardup_recall saturation-guard idiom) instead
    * of silently thinning matches.
    */
  private[graft] def mediaNeardupProbe(
      batchHashes: org.apache.spark.sql.DataFrame,
      indexBands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cap = graft.operators.LshBandJoin.DefaultMaxBucket
    val cands = broadcast(
        bandFrame(batchHashes, bandKeys4).join(batchHashes, "doc_id")
          .select(col("doc_id").as("q_id"), col("h64").as("qh"),
            col("band_key")))
      .join(indexBands.select(col("doc_id").as("cand_id"),
        col("h64").as("ch"), col("band_key")), "band_key")
      .where(col("cand_id") =!= col("q_id"))
      .withColumn("hamming", expr("CAST(bit_count(qh ^ ch) AS BIGINT)"))
      .where(col("hamming") <= NearDupMaxHamming)
      .select(col("q_id"), col("cand_id"), col("hamming")).distinct()
    val byBest = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming"), col("cand_id"))
    val best = cands.withColumn("__rn", row_number().over(byBest))
      .where(col("__rn") === 1)
    val sat = graft.operators.LshBandJoin
      .oversizedBuckets(indexBands.select(col("doc_id"), col("band_key")),
        "doc_id", cap)
      .agg(count(lit(1)).as("n_saturated"))
    batchHashes.select(col("doc_id"))
      .join(best.select(col("q_id").as("doc_id"),
        col("cand_id").as("match_doc_id"), col("hamming")),
        Seq("doc_id"), "left")
      .crossJoin(broadcast(sat)) // 1-row aggregate
      .where(coalesce(assert_true(col("n_saturated") === 0,
        lit("media near-dup probe: an index band bucket exceeds the " +
          "hot-bucket cap — matches would silently thin; widen the " +
          "bands or repair the degenerate payload column")), lit(true)))
      .select(col("doc_id"),
        col("match_doc_id").isNotNull.as("is_dup"),
        col("match_doc_id"), col("hamming"))
  }

  /** Corpus/batch split for the incremental row (the semIncr/
    * dirty-feed convention): corpus = base payloads with
    * doc_id % 10 != 0 — the "already indexed" side; batch = the
    * doc_id % 10 == 0 base docs (fresh arrivals, mostly no match)
    * plus the re-encoded variants of CORPUS docs (true near-dups the
    * probe must catch). Each side filters its OWN scan with one pure
    * residue predicate — never an OR across the union.
    */
  private def mediaIncrCorpus(s: org.apache.spark.sql.SparkSession,
                              dir: String) =
    neardupPayloadParts(s, dir)._1.where(col("doc_id") % 10 =!= 0)
  private def mediaIncrBatch(s: org.apache.spark.sql.SparkSession,
                             dir: String) = {
    val (base, variants) = neardupPayloadParts(s, dir)
    base.where(col("doc_id") % 10 === 0)
      .unionByName(variants.where(col("orig_id") % 10 =!= 0)
        .select(col("doc_id"), col("payload")))
  }

  /** `hs` must be MATERIALIZED by the caller (one lineage cut of the
    * 16-byte (doc_id, h64) rows — guide §2.3 "fingerprints only"): the
    * banding and BOTH verify joins consume it, so an un-cut hash frame
    * re-ran the payload synthesis + native hash kernel once per
    * consumer (profiled: duplicated ~0.3 s kernel jobs on every
    * near-dup row; the recall A/B re-ran the kernel up to 7x).
    */
  private def verifiedPairs(hs: org.apache.spark.sql.DataFrame,
                            bands: org.apache.spark.sql.DataFrame) = {
    graft.operators.LshBandJoin
      .candidatePairs(bands, "doc_id", graft.operators.LshBandJoin.DefaultMaxBucket)
      .join(hs.select(col("doc_id").as("doc_id_a"), col("h64").as("ha")),
        "doc_id_a")
      .join(hs.select(col("doc_id").as("doc_id_b"), col("h64").as("hb")),
        "doc_id_b")
      .withColumn("hamming",
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)"))
      .where(col("hamming") <= NearDupMaxHamming)
      .select(col("doc_id_a"), col("doc_id_b"), col("hamming"))
  }

  /** Spec accessors (StreamingSpec's stream ≡ batch pin): the
    * incremental fixture's corpus band payload and batch payloads.
    */
  private[graft] def mediaIncrCorpusPayload(
      s: org.apache.spark.sql.SparkSession, dir: String) = {
    graft.functions.GraftExtensions.install(s)
    mediaBandPayload(mediaIncrCorpus(s, dir)
      .selectExpr("doc_id", "dhash64(payload) AS h64"))
  }
  private[graft] def mediaIncrBatchPayloads(
      s: org.apache.spark.sql.SparkSession, dir: String) =
    mediaIncrBatch(s, dir)

  val queries: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, dir) =>
      Multimodal.documentFeatures(s,
        t(s, dir, "documents")
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text")))),

    // Frame sampling over the binary payload (4-byte frames, keep every
    // 2nd): the video-sampling plumbing with the codec stubbed to byte
    // slicing — one output row per kept frame. The binary frame is
    // hex-encoded for the compare (the driver's pandas comparator can't
    // sort raw bytes); both sides emit identical uppercase hex.
    "q_multimodal_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(media(s, dir), frameBytes = 4, stride = 2)
        .withColumn("frame", hex(col("frame")))),

    // Resize stub: nearest-neighbor byte resample of the 16-byte payload
    // to the 64x64 target's 4-byte budget, metadata rewritten to match.
    // Payload hex-encoded for the compare, same as frames above.
    "q_multimodal_resize" -> ((s, dir) => {
      import s.implicits._
      Multimodal.resize(media(s, dir), 64, 64).toDF()
        .withColumn("payload", hex(col("payload")))
    }),

    // Exact media dedup — the byte-identical-payload face of W1/exact
    // dedup for binary columns (re-scraped images, mirrored audio): one
    // hash group-by per (modality, payload digest), keep-first verdict
    // by min doc_id. At 100 TB the group key is the 16-byte digest, not
    // the payload — a real build hashes each blob map-side (here the
    // synthetic payload IS its digest) and shuffles only (kind, digest,
    // doc_id), so dedup cost is independent of media size.
    // Audio frame energy + silence verdict over the binary payload
    // decoded as BE int16 PCM (decode stubbed; the Spark plumbing —
    // modality routing, per-partition decode, frame explosion — is
    // real). 4-sample frames of the 8-sample fake => 2 frames/doc; the
    // threshold sits mid-distribution so both verdicts occur.
    "q_multimodal_audio_energy" -> ((s, dir) =>
      Multimodal.audioFrameEnergy(media(s, dir), samplesPerFrame = 4,
        silenceThreshold = SilenceThreshold).toDF()),

    "q_multimodal_dedup" -> ((s, dir) =>
      media(s, dir)
        .groupBy(col("kind"), hex(col("payload")).as("payload_md5"))
        .agg(min(col("doc_id")).as("keep_doc_id"),
          count(lit(1)).as("n_copies"))),

    // PERCEPTUAL media near-dup — what the byte-digest dedup above
    // cannot see: re-encoded/resized copies that differ in bytes but
    // not in structure. dHash (native codegen kernel dhash64, decode
    // stubbed per the multimodal discipline) gives every payload a
    // 64-bit gradient fingerprint; candidates come from a 4x16-bit
    // Hamming band join through the SAME LshBandJoin primitive every
    // near-dup family uses (hot-bucket star cap included), and each
    // candidate is verified by exact Hamming distance <= 6. The
    // fixture's re-encoded variants (byte-5 bump under doc_id + 1e9)
    // land a few bits away and MUST surface here — plus the exact
    // duplicates at distance 0. 100 TB: the only shuffle is the band
    // key, the hash is 8 bytes/doc, payload bytes never leave the
    // scan. Oracle = the identical pixel/bit/hash lattice + band join
    // + verify, replayed from the md5 hex.
    "q_multimodal_neardup" -> ((s, dir) => {
      // one kernel pass (r21 resume — see verifiedPairs' contract)
      val hs = graft.plans.Checkpoints.cut(neardupHashes(s, dir))
      verifiedPairs(hs, bandFrame(hs, bandKeys4))
    }),

    // The near-dup family's CLUSTER/CANONICAL face (the media mirror
    // of q_dedup_cluster_pick): verified near-dup pairs feed the same
    // star-contraction components operator every dedup family uses,
    // and the canonical pick is the min-id member (keep-first — an
    // original always beats its re-encoded variant, whose id carries
    // the offset). One row per payload: (doc_id, component, keep).
    // Oracle = the identical pair lattice + a recursive min-label
    // closure.
    "q_multimodal_neardup_canonical" -> ((s, dir) => {
      // one kernel pass for the pairs AND the node spine (r21 resume —
      // see verifiedPairs' contract; was 4 payload+kernel passes)
      val hs = graft.plans.Checkpoints.cut(neardupHashes(s, dir))
      val pairs = verifiedPairs(hs, bandFrame(hs, bandKeys4))
      val edges = pairs
        .select(col("doc_id_a").as("src"), col("doc_id_b").as("dst"))
        .unionAll(pairs
          .select(col("doc_id_b").as("src"), col("doc_id_a").as("dst")))
      graft.operators.ConnectedComponents
        .minLabel(hs.select(col("doc_id").as("node")), edges)
        .select(col("node").as("doc_id"),
          col("component").cast("long").as("component"),
          (col("node") === col("component")).as("keep"))
    }),

    // The measure-don't-assume row beside it: 4x16 banding is
    // pigeonhole-exact only to distance 3; this A/B measures its pair
    // recall at the row's threshold (6) against an EXACT baseline
    // computed with the lossless 7-band layout (pigeonhole: <= 6
    // differing bits cannot touch all 7 bands) — so even the "exact"
    // side is an equi-join, bounded at any scale, not an all-pairs
    // scan. The exactness claim holds only while NO 7-band bucket
    // saturates the hot-bucket star cap (a saturated bucket thins the
    // baseline's pairs and the "exact" denominator silently
    // understates), so the row carries an in-plan saturation guard:
    // a corpus dense enough to saturate REFUSES with the
    // shrink-the-subset prescription instead of overstating recall.
    // Subset doc_id % 5 == 0 keeps the baseline row honest about its
    // cost at 100 TB (the denominator is measured on a sample, and
    // the variant pairs exist inside it by construction).
    "q_multimodal_neardup_recall" -> ((s, dir) => {
      // one kernel pass for BOTH bandings, both verifies and the
      // saturation guard (r21 resume — see verifiedPairs' contract;
      // this A/B re-ran the payload+kernel derivation up to 7x)
      val hs = graft.plans.Checkpoints.cut(
        neardupHashes(s, dir).where(col("doc_id") % RecallMod === 0))
      val bands7 = bandFrame(hs, bandKeys7)
      val exact = verifiedPairs(hs, bands7)
        .agg(count(lit(1)).as("exact_pairs"))
      val caught = verifiedPairs(hs, bandFrame(hs, bandKeys4))
        .agg(count(lit(1)).as("caught_pairs"))
      val sat = graft.operators.LshBandJoin
        .oversizedBuckets(bands7, "doc_id",
          graft.operators.LshBandJoin.DefaultMaxBucket)
        .agg(count(lit(1)).as("n_saturated"))
      exact.crossJoin(broadcast(caught)) // three 1-row aggregates
        .crossJoin(broadcast(sat))
        .where(coalesce(assert_true(col("n_saturated") === 0,
          lit("neardup recall: the 7-band EXACT baseline saturated the " +
            "hot-bucket cap — its pair count would silently understate; " +
            "shrink the measurement subset (RecallMod) or widen the " +
            "exact bands")), lit(true)))
        // the empty-baseline assert runs BEFORE the division project:
        // under ANSI mode a Project beneath the Filter would surface an
        // empty baseline as DIVIDE_BY_ZERO instead of this message
        .where(coalesce(assert_true(col("exact_pairs") > 0,
          lit("neardup recall: empty exact baseline — the fixture must " +
            "contain near-dup pairs in the subset")), lit(true)))
        .selectExpr("exact_pairs", "caught_pairs",
          "CAST((CAST(caught_pairs AS DECIMAL(38,0)) * 1000000) " +
            "div exact_pairs AS BIGINT) AS recall_ppm")
    }),

    // INCREMENTAL media near-dup — the daily-ingest shape (the
    // q_dedup_incremental / semIncr discipline on the media plane): a
    // NEW batch of payloads probes the PERSISTED dHash band index
    // instead of recomputing the corpus join — batch band keys
    // broadcast against the index table (scanned once map-side, never
    // reshuffled), exact-Hamming verify, deterministic best pick, and
    // unmatched arrivals survive as explicit is_dup=false rows. Cost
    // is O(batch x bucket) + one index scan — never corpus². The
    // corpus index is memoized here because the driver contract gives
    // rows no warehouse; the table-backed face is
    // Orchestrator.indexMediaBatch + mediaNeardupAgainstIndex, the
    // stream face is StreamingJobs.mediaNeardupStream — one verdict
    // contract across all three (StreamingSpec pins stream ≡ batch).
    // Oracle = the plain band join + the same ROW_NUMBER pick.
    "q_multimodal_neardup_incremental" -> ((s, dir) => {
      graft.functions.GraftExtensions.install(s)
      def hashed(df: org.apache.spark.sql.DataFrame) =
        df.selectExpr("doc_id", "dhash64(payload) AS h64")
      val indexBands = mediaMemo.get(s, s"mediabands:$dir") {
        val hs = hashed(mediaIncrCorpus(s, dir))
        bandFrame(hs, bandKeys4).join(hs, "doc_id").cutLineage()
      }
      mediaNeardupProbe(hashed(mediaIncrBatch(s, dir)), indexBands)
    }),

    // The pHash face of the banded near-dup join — BOTH perceptual
    // kernels are first-class in the same candidate pipeline: phash64
    // hashes feed the identical 4x16-bit Hamming bands through
    // LshBandJoin.candidatePairs and the identical exact-Hamming
    // verify, so a deployment picks its kernel (or runs both) without
    // new plumbing. Same scale shape as q_multimodal_neardup: 8
    // bytes/doc leave the scan, only band keys shuffle. Oracle = the
    // pHash DCT lattice on the shared CosQ literals + the SAME banded
    // pair CTEs the dHash row uses.
    "q_multimodal_neardup_phash" -> ((s, dir) => {
      graft.functions.GraftExtensions.install(s)
      // one pHash/DCT kernel pass (r21 resume — see verifiedPairs'
      // contract; the DCT is the costliest kernel of the family)
      val hs = graft.plans.Checkpoints.cut(neardupPayloads(s, dir)
        .selectExpr("doc_id", "phash64(payload) AS h64"))
      verifiedPairs(hs, bandFrame(hs, bandKeys4))
    }),

    // dHash vs pHash ROBUSTNESS A/B — one perceptual family is a
    // single point of failure for the media-dedup claim, so the
    // integer-DCT pHash kernel (MediaHash.phash64 — codegen, SQL-
    // registered, bit-exact on the CosQ quantized-cosine lattice)
    // rides beside dHash and this row MEASURES both kernels' recall
    // under the three stub transform families ([[PhashAbMod]] doc).
    // Pairs are (original, variant) BY CONSTRUCTION — an equi-join on
    // doc_id, no banding, so the A/B measures the KERNELS, not the
    // candidate generation. Everything integer → hash-exact oracle
    // (the pHash DCT replays in DuckDB on the same CosQ literals).
    "q_multimodal_phash_ab" -> ((s, dir) => {
      graft.functions.GraftExtensions.install(s)
      val tx = coalesce(col("text"), lit(""))
      val docs = t(s, dir, "documents")
        .where(col("doc_id") % PhashAbMod === 0)
        .select(col("doc_id"), concat(
          md5(tx), md5(concat(tx, lit("1"))), md5(concat(tx, lit("2"))),
          md5(concat(tx, lit("3"))), md5(concat(tx, lit("4")))).as("h"))
      // per-byte hex remaps of the 80-byte plane (engine-side fixture)
      val byteAt = "CAST(conv(substring(h, 2*i+1, 2), 16, 10) AS BIGINT)"
      def remap(f: String) =
        s"concat_ws('', transform(sequence(0, 79), " +
          s"i -> lpad(hex($f), 2, '0')))"
      val fams = docs
        .withColumn("v_reencode",
          expr(remap(s"IF(i = 5, ($byteAt + 96) % 256, $byteAt)")))
        .withColumn("v_levels", expr(remap(s"least($byteAt + 8, 255)")))
        .withColumn("v_dither", expr(remap(
          s"IF(i % 2 = 0, least($byteAt + 16, 255), " +
            s"greatest($byteAt - 16, 0))")))
      val hams = fams.selectExpr("h",
          "stack(3, 'reencode', v_reencode, 'levels', v_levels, " +
            "'dither', v_dither) AS (family, hv)")
        .selectExpr("family",
          "CAST(bit_count(dhash64(unhex(h)) ^ dhash64(unhex(hv))) " +
            "AS BIGINT) AS hd",
          "CAST(bit_count(phash64(unhex(h)) ^ phash64(unhex(hv))) " +
            "AS BIGINT) AS hp")
      hams.groupBy(col("family")).agg(
          count(lit(1)).as("pairs"),
          sum(when(col("hd") <= NearDupMaxHamming, 1L).otherwise(0L))
            .as("dc"),
          sum(col("hd")).as("dsum"),
          sum(when(col("hp") <= NearDupMaxHamming, 1L).otherwise(0L))
            .as("pc"),
          sum(col("hp")).as("psum"))
        .selectExpr("family", "pairs",
          "stack(2, 'dhash', dc, dsum, 'phash', pc, psum) " +
            "AS (kernel, caught_pairs, hamming_sum)")
        .selectExpr("family", "kernel", "pairs", "caught_pairs",
          "CAST((caught_pairs * 1000000) div pairs AS BIGINT) AS recall_ppm",
          "hamming_sum")
    }))

  /** Near-dup oracle lattice: replay payload bytes (md5 hex + the
    * variant's byte-5 bump), the 72-cell pixel resample, the 64
    * gradient bits, and the two's-complement hash (two 32-bit halves —
    * SUM promotes to HUGEINT, the recombination is BIGINT-exact).
    */
  /** The shared docs0+pay+paysub prefix (payload hex for base rows +
    * re-encoded variants) both hash lattices build on.
    */
  private def neardupPayCtes(subsetWhere: String): String =
    s"""WITH docs0 AS (
           SELECT doc_id,
                  CONCAT(md5(COALESCE(text, '')),
                         md5(CONCAT(COALESCE(text, ''), '1')),
                         md5(CONCAT(COALESCE(text, ''), '2')),
                         md5(CONCAT(COALESCE(text, ''), '3')),
                         md5(CONCAT(COALESCE(text, ''), '4'))) AS h
           FROM documents),
         pay AS (
           SELECT doc_id, h FROM docs0
           UNION ALL
           SELECT doc_id + $VariantOffset,
                  CONCAT(SUBSTRING(h, 1, 10),
                         lpad(lower(hex((CAST(CONCAT('0x',
                           SUBSTRING(h, 11, 2)) AS BIGINT) + 96) % 256)),
                           2, '0'),
                         SUBSTRING(h, 13, 148))
           FROM docs0 WHERE doc_id % $VariantMod = $VariantRes),
         paysub AS (SELECT * FROM pay $subsetWhere)"""

  private def neardupHashCtes(subsetWhere: String): String =
    neardupPayCtes(subsetWhere) + s""",
         px AS MATERIALIZED (
           SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                  CAST(CONCAT('0x', SUBSTRING(h,
                    CAST(2*((t.i*80)//72) + 1 AS INT), 2)) AS BIGINT) AS p
           FROM paysub, range(72) t(i)),
         bits AS MATERIALIZED (
           SELECT a.doc_id, (a.i//9)*8 + (a.i%9) AS pos,
                  CASE WHEN a.p > b.p THEN 1 ELSE 0 END AS bit
           FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.i = a.i + 1
           WHERE a.i % 9 < 8),
         hh AS (
           SELECT doc_id,
                  SUM(CASE WHEN pos < 32
                        THEN bit * (1::BIGINT << CAST(pos AS INT))
                        ELSE 0 END) AS lo,
                  SUM(CASE WHEN pos >= 32
                        THEN bit * (1::BIGINT << CAST(pos - 32 AS INT))
                        ELSE 0 END) AS hi
           FROM bits GROUP BY doc_id),
         hsh AS MATERIALIZED (
           SELECT doc_id,
                  CAST(CASE WHEN hi >= 2147483648
                            THEN (hi - 4294967296) * 4294967296 + lo
                            ELSE hi * 4294967296 + lo END AS BIGINT) AS h64
           FROM hh)"""

  /** pHash lattice over `paysub` → `hsh (doc_id, h64)` — the
    * phashAbOracle DCT machinery re-keyed to the near-dup payload
    * plane, so the banded-pair CTEs ([[neardupPairCtes]]) run on
    * either kernel's hashes unchanged. Bit positions 0..62 (DC
    * dropped, nonnegative), lower-median pick at rn=32 of 63.
    */
  private def phashHashCtes(subsetWhere: String): String =
    neardupPayCtes(subsetWhere) + s""",
         cq(u, i, c) AS (SELECT * FROM (VALUES $cosqValues)),
         pbytes AS MATERIALIZED (
           SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                  CAST(CONCAT('0x', SUBSTRING(h, CAST(2*t.i+1 AS INT), 2))
                    AS BIGINT) AS b
           FROM paysub, range(80) t(i)),
         pgrid AS MATERIALIZED (
           SELECT p.doc_id, t.k // 32 AS gi, t.k % 32 AS gj, p.b AS px
           FROM range(1024) t(k) JOIN pbytes p ON p.i = (t.k * 80) // 1024),
         trow AS MATERIALIZED (
           SELECT g.doc_id, g.gi AS i, cq.u AS v,
                  CAST(SUM(g.px * cq.c) AS BIGINT) AS tv
           FROM pgrid g JOIN cq ON cq.i = g.gj
           GROUP BY g.doc_id, g.gi, cq.u),
         coef AS MATERIALIZED (
           SELECT t.doc_id, cq.u AS u, t.v AS v,
                  CAST(SUM(cq.c * t.tv) AS BIGINT) AS cv
           FROM trow t JOIN cq ON cq.i = t.i
           GROUP BY t.doc_id, cq.u, t.v),
         pmed AS (
           SELECT doc_id, cv AS med FROM (
             SELECT doc_id, cv,
                    ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY cv) AS rn
             FROM coef WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
         hsh AS MATERIALIZED (
           SELECT c.doc_id,
                  CAST(SUM(CASE WHEN c.cv > m.med
                           THEN 1::BIGINT << CAST(c.u*8 + c.v - 1 AS INT)
                           ELSE 0 END) AS BIGINT) AS h64
           FROM coef c JOIN pmed m ON m.doc_id = c.doc_id
           WHERE NOT (c.u = 0 AND c.v = 0)
           GROUP BY c.doc_id)"""

  /** 4 x 16-bit production band keys ("k:value" — the engine's). */
  private val band4Sql: String =
    """SELECT doc_id, CONCAT(t.k, ':',
         CAST((h64 >> CAST(16*t.k AS INT)) & 65535 AS VARCHAR)) AS band_key
       FROM hsh, range(4) t(k)"""

  /** Lossless 7-band keys ("ek:value"), mirroring [[Band7Layout]]. */
  private val band7Sql: String =
    Band7Layout.zipWithIndex.map { case ((off, len), k) =>
      s"""SELECT doc_id, CONCAT('e$k:',
            CAST((h64 >> $off) & ${(1L << len) - 1} AS VARCHAR)) AS band_key
          FROM hsh"""
    }.mkString("\n       UNION ALL\n       ")

  /** Band join + hot-bucket star cap + exact-Hamming verify — the
    * LshBandJoin.candidatePairs semantics verbatim (the SimQueries
    * oracle idiom), suffixed so two bandings can coexist in one query.
    */
  private def neardupPairCtes(bandsSql: String, sfx: String): String =
    s""",
         bands$sfx AS MATERIALIZED ($bandsSql),
         bstat$sfx AS (
           SELECT band_key, COUNT(DISTINCT doc_id) AS bucket_n,
                  MIN(doc_id) AS bucket_min
           FROM bands$sfx GROUP BY band_key),
         cands$sfx AS (
           SELECT DISTINCT a, b FROM (
             SELECT x.doc_id AS a, y.doc_id AS b
             FROM bands$sfx x JOIN bands$sfx y
               ON x.band_key = y.band_key AND x.doc_id < y.doc_id
             JOIN bstat$sfx st ON st.band_key = x.band_key
               AND st.bucket_n <= ${graft.operators.LshBandJoin.DefaultMaxBucket}
             UNION ALL
             SELECT st.bucket_min AS a, y.doc_id AS b
             FROM bands$sfx y JOIN bstat$sfx st ON st.band_key = y.band_key
             WHERE st.bucket_n > ${graft.operators.LshBandJoin.DefaultMaxBucket}
               AND y.doc_id > st.bucket_min)),
         pairs$sfx AS (
           SELECT c.a AS doc_id_a, c.b AS doc_id_b,
                  CAST(bit_count(xor(ha.h64, hb.h64)) AS BIGINT) AS hamming
           FROM cands$sfx c
           JOIN hsh ha ON ha.doc_id = c.a
           JOIN hsh hb ON hb.doc_id = c.b
           WHERE bit_count(xor(ha.h64, hb.h64)) <= $NearDupMaxHamming)"""

  /** The [[graft.functions.MediaHash.CosQ]] quantized-cosine lattice
    * as a 256-tuple SQL VALUES literal — the SAME integers the kernel
    * compiled in, so the oracle's DCT is the kernel's bit-for-bit.
    */
  private val cosqValues: String =
    graft.functions.MediaHash.CosQ.zipWithIndex.flatMap { case (row, u) =>
      row.zipWithIndex.map { case (c, i) => s"($u,$i,$c)" }
    }.mkString(",")

  /** q_multimodal_phash_ab oracle: replay BOTH kernels per plane —
    * dhash via the 72-cell gradient lattice (the neardup oracle idiom,
    * keyed by plane), phash via the separable integer DCT on the CosQ
    * literal, lower-median pick by ROW_NUMBER (rn=32 of 63 — a value,
    * so duplicate coefficients cannot make it nondeterministic).
    */
  private val phashAbOracle: String =
    s"""WITH docs0 AS (
           SELECT doc_id,
                  CONCAT(md5(COALESCE(text, '')),
                         md5(CONCAT(COALESCE(text, ''), '1')),
                         md5(CONCAT(COALESCE(text, ''), '2')),
                         md5(CONCAT(COALESCE(text, ''), '3')),
                         md5(CONCAT(COALESCE(text, ''), '4'))) AS h
           FROM documents WHERE doc_id % $PhashAbMod = 0),
         bytes AS MATERIALIZED (
           SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                  CAST(CONCAT('0x', SUBSTRING(h, CAST(2*t.i+1 AS INT), 2))
                    AS BIGINT) AS b
           FROM docs0, range(80) t(i)),
         planes AS MATERIALIZED (
           SELECT doc_id, 'orig' AS plane, i, b FROM bytes
           UNION ALL SELECT doc_id, 'reencode', i,
             CASE WHEN i = 5 THEN (b + 96) % 256 ELSE b END FROM bytes
           UNION ALL SELECT doc_id, 'levels', i, LEAST(b + 8, 255) FROM bytes
           UNION ALL SELECT doc_id, 'dither', i,
             CASE WHEN i % 2 = 0 THEN LEAST(b + 16, 255)
                  ELSE GREATEST(b - 16, 0) END FROM bytes),
         cq(u, i, c) AS (SELECT * FROM (VALUES $cosqValues)),
         dgrid AS MATERIALIZED (
           SELECT p.doc_id, p.plane, t.k AS k, p.b AS px
           FROM range(72) t(k) JOIN planes p ON p.i = (t.k * 80) // 72),
         dbits AS (
           SELECT a.doc_id, a.plane, (a.k//9)*8 + (a.k%9) AS pos,
                  CASE WHEN a.px > b.px THEN 1 ELSE 0 END AS bit
           FROM dgrid a JOIN dgrid b ON b.doc_id = a.doc_id
             AND b.plane = a.plane AND b.k = a.k + 1
           WHERE a.k % 9 < 8),
         dhh AS (
           SELECT doc_id, plane,
                  SUM(CASE WHEN pos < 32
                        THEN bit * (1::BIGINT << CAST(pos AS INT))
                        ELSE 0 END) AS lo,
                  SUM(CASE WHEN pos >= 32
                        THEN bit * (1::BIGINT << CAST(pos - 32 AS INT))
                        ELSE 0 END) AS hi
           FROM dbits GROUP BY doc_id, plane),
         dh AS MATERIALIZED (
           SELECT doc_id, plane,
                  CAST(CASE WHEN hi >= 2147483648
                            THEN (hi - 4294967296) * 4294967296 + lo
                            ELSE hi * 4294967296 + lo END AS BIGINT) AS h
           FROM dhh),
         pgrid AS MATERIALIZED (
           SELECT p.doc_id, p.plane, t.k // 32 AS gi, t.k % 32 AS gj,
                  p.b AS px
           FROM range(1024) t(k) JOIN planes p ON p.i = (t.k * 80) // 1024),
         trow AS MATERIALIZED (
           SELECT g.doc_id, g.plane, g.gi AS i, cq.u AS v,
                  CAST(SUM(g.px * cq.c) AS BIGINT) AS tv
           FROM pgrid g JOIN cq ON cq.i = g.gj
           GROUP BY g.doc_id, g.plane, g.gi, cq.u),
         coef AS MATERIALIZED (
           SELECT t.doc_id, t.plane, cq.u AS u, t.v AS v,
                  CAST(SUM(cq.c * t.tv) AS BIGINT) AS cv
           FROM trow t JOIN cq ON cq.i = t.i
           GROUP BY t.doc_id, t.plane, cq.u, t.v),
         pmed AS (
           SELECT doc_id, plane, cv AS med FROM (
             SELECT doc_id, plane, cv,
                    ROW_NUMBER() OVER (PARTITION BY doc_id, plane
                                       ORDER BY cv) AS rn
             FROM coef WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32),
         ph AS MATERIALIZED (
           SELECT c.doc_id, c.plane,
                  CAST(SUM(CASE WHEN c.cv > m.med
                           THEN 1::BIGINT << CAST(c.u*8 + c.v - 1 AS INT)
                           ELSE 0 END) AS BIGINT) AS h
           FROM coef c JOIN pmed m ON m.doc_id = c.doc_id
             AND m.plane = c.plane
           WHERE NOT (c.u = 0 AND c.v = 0)
           GROUP BY c.doc_id, c.plane),
         per AS (
           SELECT v.doc_id, v.plane AS family,
                  CAST(bit_count(xor(dho.h, dhv.h)) AS BIGINT) AS hd,
                  CAST(bit_count(xor(pho.h, phv.h)) AS BIGINT) AS hp
           FROM (SELECT DISTINCT doc_id, plane FROM planes
                 WHERE plane <> 'orig') v
           JOIN dh dho ON dho.doc_id = v.doc_id AND dho.plane = 'orig'
           JOIN dh dhv ON dhv.doc_id = v.doc_id AND dhv.plane = v.plane
           JOIN ph pho ON pho.doc_id = v.doc_id AND pho.plane = 'orig'
           JOIN ph phv ON phv.doc_id = v.doc_id AND phv.plane = v.plane)
         SELECT family, 'dhash' AS kernel,
                CAST(COUNT(*) AS BIGINT) AS pairs,
                CAST(SUM(CASE WHEN hd <= $NearDupMaxHamming THEN 1 ELSE 0 END)
                  AS BIGINT) AS caught_pairs,
                CAST((SUM(CASE WHEN hd <= $NearDupMaxHamming THEN 1 ELSE 0 END)
                      * 1000000) // COUNT(*) AS BIGINT) AS recall_ppm,
                CAST(SUM(hd) AS BIGINT) AS hamming_sum
         FROM per GROUP BY family
         UNION ALL
         SELECT family, 'phash',
                CAST(COUNT(*) AS BIGINT),
                CAST(SUM(CASE WHEN hp <= $NearDupMaxHamming THEN 1 ELSE 0 END)
                  AS BIGINT),
                CAST((SUM(CASE WHEN hp <= $NearDupMaxHamming THEN 1 ELSE 0 END)
                      * 1000000) // COUNT(*) AS BIGINT),
                CAST(SUM(hp) AS BIGINT)
         FROM per GROUP BY family"""

  /** Incremental near-dup oracle: corpus/batch split on the shared
    * hash lattice, 4-band equi-join, exact-Hamming verify, min-
    * (hamming, cand) pick, unmatched kept by the left join.
    */
  private val neardupIncrementalOracle: String =
    neardupHashCtes("") + s""",
         corp AS (SELECT doc_id, h64 FROM hsh
                  WHERE doc_id < $VariantOffset AND doc_id % 10 <> 0),
         bat AS MATERIALIZED (SELECT doc_id, h64 FROM hsh
               WHERE (doc_id < $VariantOffset AND doc_id % 10 = 0)
                  OR (doc_id >= $VariantOffset
                      AND (doc_id - $VariantOffset) % 10 <> 0)),
         cb AS (SELECT doc_id, h64, CONCAT(t.k, ':',
                  CAST((h64 >> CAST(16*t.k AS INT)) & 65535 AS VARCHAR))
                  AS band_key
                FROM corp, range(4) t(k)),
         bb AS (SELECT doc_id, h64, CONCAT(t.k, ':',
                  CAST((h64 >> CAST(16*t.k AS INT)) & 65535 AS VARCHAR))
                  AS band_key
                FROM bat, range(4) t(k)),
         cand AS (
           SELECT DISTINCT b.doc_id, c.doc_id AS cand_id,
                  CAST(bit_count(xor(b.h64, c.h64)) AS BIGINT) AS hamming
           FROM bb b JOIN cb c ON c.band_key = b.band_key
           WHERE c.doc_id <> b.doc_id
             AND bit_count(xor(b.h64, c.h64)) <= $NearDupMaxHamming),
         best AS (
           SELECT doc_id, cand_id, hamming FROM (
             SELECT doc_id, cand_id, hamming, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY hamming, cand_id) AS rn
             FROM cand) WHERE rn = 1)
         SELECT b.doc_id, best.cand_id IS NOT NULL AS is_dup,
                best.cand_id AS match_doc_id, best.hamming
         FROM bat b LEFT JOIN best ON best.doc_id = b.doc_id"""

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_neardup_phash" ->
      (phashHashCtes("") + neardupPairCtes(band4Sql, "") + s"""
         SELECT doc_id_a, doc_id_b, hamming FROM pairs"""),

    "q_multimodal_neardup_incremental" -> neardupIncrementalOracle,
    "q_multimodal_phash_ab" -> phashAbOracle,

    "q_multimodal_neardup" ->
      (neardupHashCtes("") + neardupPairCtes(band4Sql, "") + s"""
         SELECT doc_id_a, doc_id_b, hamming FROM pairs"""),

    "q_multimodal_neardup_canonical" ->
      (neardupHashCtes("").replace("WITH docs0 AS",
        "WITH RECURSIVE docs0 AS")
        + neardupPairCtes(band4Sql, "") + s""",
         comp_edges AS (
           SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
           UNION ALL SELECT doc_id_b AS src, doc_id_a AS dst FROM pairs),
         reach AS (
           SELECT doc_id AS node, doc_id AS lbl FROM pay
           UNION
           SELECT e.src AS node, r.lbl AS lbl
           FROM comp_edges e JOIN reach r ON e.dst = r.node)
         SELECT node AS doc_id, CAST(MIN(lbl) AS BIGINT) AS component,
                node = MIN(lbl) AS keep
         FROM reach GROUP BY node"""),

    "q_multimodal_neardup_recall" ->
      (neardupHashCtes(s"WHERE doc_id % $RecallMod = 0")
        + neardupPairCtes(band7Sql, "_e")
        + neardupPairCtes(band4Sql, "_p") + s"""
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs_e) AS exact_pairs,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs_p) AS caught_pairs,
                CAST(((SELECT CAST(COUNT(*) AS HUGEINT) FROM pairs_p)
                      * 1000000)
                     // (SELECT COUNT(*) FROM pairs_e) AS BIGINT)
                  AS recall_ppm"""),

    "q_multimodal_features" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents),
         summed AS (
           SELECT doc_id, h,
                  CAST(list_sum(list_transform(range(16),
                    i -> CAST(CONCAT('0x', SUBSTRING(h, CAST(2*i+1 AS INT), 2))
                         AS BIGINT))) AS BIGINT) AS byte_sum
           FROM hexed)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(16 AS BIGINT) AS n_bytes,
                CAST(CONCAT('0x', SUBSTRING(h, 1, 2)) AS BIGINT) AS first_byte,
                byte_sum,
                CAST(byte_sum AS DOUBLE) / 16 AS mean_byte
         FROM summed""",
    "q_multimodal_frames" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(f AS BIGINT) AS frame_index,
                UPPER(SUBSTRING(h, CAST(8*f + 1 AS INT), 8)) AS frame
         FROM hexed, (SELECT unnest([0, 2]) AS f)""",
    "q_multimodal_resize" ->
      """WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h FROM documents)
         SELECT doc_id,
                CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                CAST(64 AS INT) AS width,
                CAST(64 AS INT) AS height,
                UPPER(CONCAT(SUBSTRING(h, 1, 2), SUBSTRING(h, 9, 2),
                             SUBSTRING(h, 17, 2), SUBSTRING(h, 25, 2))) AS payload
         FROM hexed""",
    // BE int16 decode of consecutive md5-hex byte pairs; DuckDB's
    // '0x…' string cast parses the hex (the PQ-oracle idiom)
    "q_multimodal_audio_energy" ->
      s"""WITH hexed AS (
           SELECT doc_id, md5(COALESCE(text, '')) AS h
           FROM documents WHERE doc_id % 3 = 1),
         samp AS (
           SELECT doc_id, CAST(t.i AS BIGINT) AS i,
                  CAST(CONCAT('0x',
                    SUBSTRING(h, CAST(4*t.i + 1 AS INT), 4)) AS BIGINT) AS u
           FROM hexed, range(8) t(i)),
         sgn AS (
           SELECT doc_id, i,
                  CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
           FROM samp)
         SELECT doc_id, CAST(i // 4 AS BIGINT) AS frame_index,
                CAST(SUM(s*s) AS BIGINT) AS energy,
                CAST(SUM(s*s) AS BIGINT) < $SilenceThreshold AS is_silence
         FROM sgn GROUP BY doc_id, i // 4""",

    "q_multimodal_dedup" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio'
                     ELSE 'video' END AS kind,
                UPPER(md5(COALESCE(text, ''))) AS payload_md5,
                MIN(doc_id) AS keep_doc_id,
                COUNT(*) AS n_copies
         FROM documents
         GROUP BY 1, 2""")
}
