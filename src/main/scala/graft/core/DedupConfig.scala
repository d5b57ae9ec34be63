package graft.core

/** The frozen shingle/signature configuration.
  *
  * BASELINE.json demands recall >= 0.99 "at the same shingle/signature
  * config" between the pipeline and the reference (brute-force oracle)
  * implementation. Every constant that influences a signature lives here and
  * ONLY here, so pipeline and oracle cannot drift (SURVEY.md §7.4).
  */
final case class DedupConfig(
    /** char k-gram length for shingling (after normalization) */
    shingleK: Int = 5,
    /** MinHash signature width */
    numHashes: Int = 128,
    /** LSH bands (bands * rowsPerBand == numHashes) */
    bands: Int = 32,
    /** LSH rows per band */
    rowsPerBand: Int = 4,
    /** exact Jaccard threshold for the near-duplicate predicate */
    jaccardThreshold: Double = 0.7,
    /** SimHash Hamming-block count (pigeonhole: <=hammingMax shares a block) */
    simhashBlocks: Int = 4,
    /** max Hamming distance for the SimHash near-duplicate predicate */
    hammingMax: Int = 3,
    /** min normalized length (chars) for the substring-containment predicate */
    minContainLen: Int = 100,
    /** winnowing window (shingles) for the substring candidate lane */
    winnowWindow: Int = 32,
    /** winnowing shingle length (chars) — larger than shingleK so a bucket
      * collision implies a shared 16-char run, not a common 5-gram; the
      * winnowing guarantee covers shared substrings >= winnowWindow +
      * winnowK - 1 = 47 chars < minContainLen */
    winnowK: Int = 16,
    /** master seed for all hash families */
    seed: Long = 42L,
    /** cap on LSH bucket size before salted overflow handling (skew guard) */
    maxBucketSize: Int = 64,
    /** max bucket-run ids buffered in the single-exchange pair generation
      * before switching to the bounded-memory streaming expansion
      * ([[graft.dedup.CandidatePairs]]). At the default cap*MaxSalts the
      * streaming path's pinned salts=MaxSalts equals the exact saltCount
      * (it saturates), so the emitted pairs stay a pure function of the
      * data at ANY run length. */
    runBufferCap: Int = 65536,
    /** pin the verification lookup tables (slim signatures + norm texts)
      * as the broadcast build side. Right whenever one executor can hold
      * the corpus' norm table (bench scale, and clusters up to ~10^8
      * medium clips with high executor memory); set false beyond that and
      * AQE picks the sort-merge plan instead. */
    broadcastLookups: Boolean = true,
    /** row-count ceiling above which [[graft.dedup.DedupPipeline.run]]
      * ignores broadcastLookups=true and falls back to AQE-chosen joins —
      * a corpus whose slim+norm lookup tables outgrow executor memory must
      * degrade to sort-merge, not OOM the build side. ~5e6 medium clips
      * ≈ low-GB broadcast relations; tune per deployment. */
    broadcastLookupMaxRows: Long = 5000000L,
    /** hot-bucket detection: exact per-key counts (default — deterministic
      * under any partitioning, map-side-combined shuffle of distinct keys)
      * vs the Misra-Gries sketch (O(k) driver bytes, the 10^12-row path,
      * but partition-dependent near the threshold). */
    sketchHotKeys: Boolean = false,
    /** edge-count ceiling for the driver-local union-find CC fast path
      * ([[graft.dedup.ConnectedComponents.runLocal]]): at or below this the
      * verified dup graph is a few MB and ~15 scheduler round-trips of
      * near-empty stages cost more than the whole contraction; above it the
      * iterative min-label loop runs (the production path — the 160k-clip
      * bench graph is ~5x this ceiling and always takes it). Output is
      * bit-identical either way (checksum- and oracle-gated). */
    ccLocalMaxEdges: Long = 100000L,
    /** shuffle-partition multiplier for the pipeline's FAT stages (bucket
      * pair generation + pair aggregation + verification): these few stages
      * carry nearly all the task time, and at partitions == cores one
      * straggler (a partition that drew the hottest bucket keys) holds
      * every other core idle for the stage tail. Factor 2 halves the
      * expected tail at ~0.2 core-sec of fixed per-task cost. The CC loop
      * and output stages stay at the unmultiplied clamp (their per-stage
      * work is tiny; extra tasks there are pure scheduling overhead).
      * Results are partitioning-independent (checksum-gated). */
    fatShuffleFactor: Int = 1,
    /** exact 64-bit id guarantee: detect hash_id collisions across distinct
      * clip_ids (one slim map-side-combined aggregation at ingest) and
      * deterministically re-key the colliding clips
      * ([[graft.dedup.ExactIds]]). Off by default — a collision is a
      * ~3e4-in-10^12-rows event and every oracle/checksum gate runs the
      * plain 64-bit path; turn on for corpora where a silent false merge is
      * unacceptable. */
    exactIds: Boolean = false,
    /** minimum winnow-lane co-emissions for a pair to enter the substring-
      * containment verification. Winnowing guarantees >= 2 shared selected
      * fingerprints for a shared run >= winnowWindow + winnowK - 1 +
      * winnowWindow chars (= 79 < minContainLen), so a true containment
      * pair co-emits >= 2 barring hot-key salt splits; corpus-wide shared
      * boilerplate (e.g. a common prefix) co-emits a few fingerprints on
      * MILLIONS of non-duplicate pairs, and this gate is what keeps the
      * exact suffix-array verification off them. Only meaningful with
      * exact hot-key counts: under sketchHotKeys the salt counts (and so
      * co-emission) are partition-dependent and the pipeline ignores the
      * gate (treats it as 1). */
    minFpsHits: Int = 2
) {
  require(bands * rowsPerBand == numHashes, "bands*rowsPerBand must equal numHashes")
  require(64 % simhashBlocks == 0, "simhashBlocks must divide 64")
  require(simhashBlocks > hammingMax, "pigeonhole needs blocks > hammingMax")
}

object DedupConfig {
  /** THE frozen config — used by pipeline, oracle, and tests alike. */
  val default: DedupConfig = DedupConfig()
}
