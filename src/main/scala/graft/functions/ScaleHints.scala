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
      /** IVF coarse-quantizer list count (√n, floor 16 — tiny corpora
        * still want a few lists; cap 2^18 keeps the centroid matrix
        * driver-safe at 64 dims ≈ 128 MB).
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

  def forCount(n: Long): Hints = Hints(
    nlist = sqrtBuckets(n, min = 16, max = 1 << 18),
    pairBlocks = sqrtBuckets(n, min = 32, max = 1 << 16),
    cellCap = sqrtBuckets(n, min = 1000).toLong)
}
