package graft.functions

/** √n sizing rule for the engine's bucketed structures.
  *
  * Every bucketed operator here (IVF lists, exact-pair hash blocks,
  * SemDeDup cells) wants its bucket COUNT to grow with the corpus so the
  * per-bucket work stays bounded: with ~√n buckets a bucket holds ~√n
  * rows, so a within-bucket quadratic step costs O(n) per bucket and
  * O(n^1.5) overall — the published regime for IVF (`nlist ≈ √n`) and
  * SemDeDup (cluster count grows with corpus size). Centralizing the rule
  * means a 100× input self-adjusts instead of silently overloading a knob
  * someone tuned at demo scale.
  */
object ScaleHints {

  /** Recommended sizes for a corpus of `n` rows. */
  final case class Hints(
      /** IVF coarse-quantizer list count (√n, floor 16). The cap is
        * DIMS-AWARE: nlist × dims × 8 B is bounded at 256 MB — the
        * centroid RELATION's broadcast budget on the large-nlist frame
        * path ([[Similarity.trainCentroidsDf]]); 2^18 stays the absolute
        * ceiling. At 64 dims that admits the full 2^18; at 768-dim
        * production embeddings the cap self-reduces to ~43k lists instead
        * of silently assuming 64 dims fits.
        */
      nlist: Int,
      /** Hash-block count for exact all-pairs operators
        * ([[Similarity.nearDupPairs]]): per-task pair work is
        * (n/blocks)·n, so √n blocks bound it at n^1.5/n^0.5·... = n per
        * row-block pair; floor 32 keeps small runs parallel.
        */
      pairBlocks: Int,
      /** Max rows per SemDeDup cell before the within-cell pair join is
        * hash-block sub-split (√n, floor 1000 — the quadratic step on
        * 1000 rows is trivially cheap, splitting finer only adds shuffle
        * keys).
        */
      cellCap: Long)

  /** Clamped ⌈√n⌉ — the shared rule. */
  def sqrtBuckets(n: Long, min: Int = 1, max: Int = 1 << 20): Int = {
    require(n >= 0, s"row count must be non-negative, got $n")
    val r = math.ceil(math.sqrt(n.toDouble)).toLong
    math.min(max.toLong, math.max(min.toLong, r)).toInt
  }

  /** `dims` sizes the nlist memory cap (default 64 — the synthetic
    * corpus's embedding width; pass the real width for production data).
    */
  def forCount(n: Long, dims: Int = 64): Hints = {
    require(dims >= 1, s"dims must be positive, got $dims")
    val memCap = math.max(16L, (256L << 20) / (8L * dims))
    Hints(
      nlist = sqrtBuckets(n, min = 16,
        max = math.min(1L << 18, memCap).toInt),
      pairBlocks = sqrtBuckets(n, min = 32, max = 1 << 16),
      cellCap = sqrtBuckets(n, min = 1000).toLong)
  }
}
