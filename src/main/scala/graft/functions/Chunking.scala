package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split each document into fixed-size character
  * windows with overlap — the context-window preparation step for
  * retrieval indexing and long-document training. Pure generator
  * expressions (sequence + explode + substr): per-row map work with no
  * shuffle at any scale, and deterministic chunk boundaries so the same
  * document always yields the same chunks.
  */
object Chunking {

  /** One row per chunk: `chunk_idx` (0-based), `chunk_start` (0-based
    * char offset), `chunk_end` (exclusive, clamped to the text length),
    * `chunk_text`. Windows start every `chunkLen - overlap` chars; a
    * document no longer than `chunkLen` yields exactly one chunk.
    * Every other column of `df` is carried through unchanged.
    */
  def chunk(df: DataFrame, textCol: String,
      chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen >= 1, "chunkLen must be >= 1")
    require(overlap >= 0 && overlap < chunkLen,
      "need 0 <= overlap < chunkLen")
    val stride = chunkLen - overlap
    // null text ⇒ zero-length: one degenerate [0, 0) chunk with null
    // text, instead of a phantom chunk_end = chunkLen (greatest/least
    // skip nulls, so an unguarded null length would leak through them)
    val len = coalesce(length(col(textCol)).cast("long"), lit(0L))
    // chunks past the first exist only for the span beyond chunkLen,
    // one per started stride: 1 + ceil((len - chunkLen) / stride)
    val extra = greatest(len - chunkLen, lit(0L))
    // ceil div on non-negative longs (the double quotient is exact well
    // past any document length; cast truncates = floor)
    val n = lit(1L) + ((extra + (stride - 1)) / lit(stride)).cast("long")
    df.withColumn("chunk_idx", explode(sequence(lit(0L), n - 1)))
      .withColumn("chunk_start", col("chunk_idx") * stride)
      .withColumn("chunk_end", least(col("chunk_start") + chunkLen, len))
      .withColumn("chunk_text",
        col(textCol).substr(
          (col("chunk_start") + 1).cast("int"), lit(chunkLen)))
  }

  /** TOKEN-window chunking — the sequence-budget sibling of [[chunk]]:
    * windows of `maxTokens` whitespace tokens with `overlap` tokens
    * shared between neighbors, boundaries that never split a token
    * (char windows do). One row per chunk: `chunk_idx`, `tok_start`
    * (0-based), `tok_end` (exclusive), `n_chunk_tokens`, `chunk_text`
    * (tokens rejoined with single spaces). Same generator-expression
    * shape: map-side only, no shuffle at any scale.
    */
  def chunkTokens(df: DataFrame, textCol: String,
      maxTokens: Int, overlap: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    require(overlap >= 0 && overlap < maxTokens,
      "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = TextAnalysis.tokens(col(textCol))
    val len = coalesce(size(toks).cast("long"), lit(0L))
    val extra = greatest(len - maxTokens, lit(0L))
    val n = lit(1L) + ((extra + (stride - 1)) / lit(stride)).cast("long")
    df.withColumn("chunk_idx", explode(sequence(lit(0L), n - 1)))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_end", least(col("tok_start") + maxTokens, len))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start"))
      .withColumn("chunk_text",
        array_join(slice(toks, (col("tok_start") + 1).cast("int"),
          lit(maxTokens)), " "))
  }

  /** CONTENT-DEFINED chunking — the Rabin-style variant next to the
    * fixed-stride windows of [[chunk]]/[[chunkTokens]]: a chunk boundary
    * falls after token `i + g - 1` wherever the hash of the g-gram
    * ending there is ≡ 0 mod m (expected chunk length ≈ m tokens).
    * Because each cut point depends only on the g tokens around it,
    * inserting or deleting text elsewhere in a document leaves every
    * other chunk's CONTENT unchanged — the property that makes CDC the
    * storage/transfer dedup splitter (fixed-stride chunking shifts every
    * downstream boundary instead). Chunk texts are therefore stable keys
    * for chunk-level dedup across document revisions.
    *
    * Output: one row per chunk — `chunk_idx` (0-based), `tok_start`
    * (0-based), `tok_end` (exclusive), `n_chunk_tokens`, `chunk_text`;
    * every other column carries through.
    *
    * Scale shape: cut-point detection is the native
    * [[CdcBoundariesExpr]] in the scan's project (one loop over the
    * shingle hashes); the remaining array algebra operates on the FEW
    * boundary positions per document, and the only generator is the
    * final per-chunk explode. No shuffle at any scale. Documents
    * shorter than g words have one whole-text shingle and yield one
    * whole-document chunk.
    */
  def chunkCdc(df: DataFrame, textCol: String,
      g: Int = 3, m: Int = 16): DataFrame = {
    require(g >= 1, "g must be >= 1")
    require(m >= 1, "m must be >= 1")
    val toks = TextAnalysis.tokens(col(textCol))
    val nTok = coalesce(size(toks).cast("long"), lit(0L))
    val cuts = Sketches.cdcBoundaries(Dedup.wordShingles(col(textCol), g), m)
    // shingle index i (1-based) cuts after token i + g - 1; a cut at the
    // document end would open an empty chunk, so it folds into the
    // appended final boundary
    val ends = concat(
      filter(transform(cuts, i => i + (g - 1)), e => e < nTok),
      array(nTok))
    df.withColumn("__ends", ends)
      .select(col("*"),
        posexplode(col("__ends")).as(Seq("chunk_idx", "tok_end")))
      .withColumn("tok_start",
        when(col("chunk_idx") === 0, lit(0L))
          .otherwise(element_at(col("__ends"), col("chunk_idx"))))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start"))
      .withColumn("chunk_text",
        array_join(slice(TextAnalysis.tokens(col(textCol)),
          (col("tok_start") + 1).cast("int"),
          col("n_chunk_tokens").cast("int")), " "))
      .drop("__ends")
  }
}
