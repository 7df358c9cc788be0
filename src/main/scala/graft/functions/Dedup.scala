package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash+LSH, SimHash, and n-gram Jaccard. All are
  * expressed as distributed DataFrame plans — the pair-generation joins
  * are blocked (banded) so nothing is quadratic in the corpus at scale.
  */
object Dedup {

  /** Exact dedup key: md5 of normalized text. */
  def contentHash(text: Column): Column = md5(lower(trim(text)))

  /** O(n) exact dedup: groups by content hash; one shuffle, map-side
    * partial agg. Returns (content_hash, n_copies, canonical_id) for
    * groups with more than one member.
    */
  def exactDups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(contentHash(col(textCol)).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))
      .filter(col("n_copies") > 1)

  /** Materialize the deduplicated corpus: keep exactly one row per
    * content hash — the canonical (smallest-id) member. No collect;
    * `skewSafe` picks the physical shape (see [[keepCanonicalByKey]]).
    */
  def keepCanonical(df: DataFrame, idCol: String, textCol: String,
      skewSafe: Boolean = false): DataFrame =
    keepCanonicalByKey(df.withColumn("__ckey", contentHash(col(textCol))),
      idCol, "__ckey", skewSafe).drop("__ckey")

  /** [[keepCanonical]] over a precomputed dedup-key column — lets callers
    * project the text payload AWAY before the shuffle, so it carries a
    * 32-byte hash instead of kilobytes of document (the text itself is
    * only needed to compute the key, not to pick the canonical row).
    *
    * Two physical shapes behind one API:
    *  - default: ONE window over the key — one shuffle, but every copy of
    *    a key lands in a single task's sort. Right at normal duplication
    *    rates; a straggler when one viral document has 10⁴+ copies.
    *  - `skewSafe`: `groupBy(key).agg(min(id))` + left-semi join back —
    *    the min partial-aggregates map-side, so a hot key reduces to one
    *    row per input partition BEFORE the exchange; costs a second
    *    shuffle for the join. Use for corpora with pathological
    *    duplication skew.
    */
  def keepCanonicalByKey(df: DataFrame, idCol: String, keyCol: String,
      skewSafe: Boolean = false): DataFrame =
    if (skewSafe) {
      // null-safe (<=>) equality on the KEY: groupBy collects NULL keys
      // into one group exactly like the window shape's partitionBy, so
      // the null-key canonical row must still match here — plain `===`
      // would silently drop every row whose dedup key is NULL (e.g. the
      // contentHash of a null text). The ID comparison stays STRICT:
      // min() ignores null ids in both shapes, and a group whose ids are
      // ALL null has no canonical member in the window shape (null ===
      // null filters false) — a null-safe id match would instead keep
      // every row of such a group and the shapes would diverge.
      val canon = df.groupBy(col(keyCol).as("__ck"))
        .agg(min(col(idCol)).as("__cid"))
      df.join(canon,
          col(keyCol) <=> col("__ck") && col(idCol) === col("__cid"),
          "left_semi")
    } else {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col(keyCol))
      df.withColumn("__canon", min(col(idCol)).over(w))
        .filter(col(idCol) === col("__canon"))
        .drop("__canon")
    }

  /** CCNet-style span-level exact dedup: split every document into
    * fixed-size token spans (the paragraph unit of public web-corpus
    * pipelines — the fixture corpus has no newlines, so a fixed token
    * window stands in for the paragraph boundary), drop every span whose
    * normalized content already appeared earlier in the corpus (global
    * first-occurrence order by (id, position)), and reassemble what
    * remains. Unlike document-level dedup this REWRITES documents:
    * boilerplate shared across distinct documents disappears from all
    * but its first carrier.
    *
    * Output: (idCol, n_spans, kept_spans, clean_text) — one row per
    * input document; a fully-duplicated document survives as an empty
    * `clean_text` with kept_spans = 0, ready for a min-length quality
    * gate downstream.
    *
    * Scale shape: explode is map-side; the first-occurrence window
    * partitions by the 128-bit span hash (uniform by construction — no
    * hot keys, at most one sort-buffer entry per duplicate copy);
    * reassembly is one groupBy on the document id whose collect_list is
    * bounded by the document's own span count. Two shuffles total,
    * both carrying (id, pos, span) — never the full corpus squared.
    */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      span: Int): DataFrame = {
    require(span >= 1, "span must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = split(col(textCol), " ")
    // ceil(n / span) spans; a null/empty doc still yields one (empty)
    // span so the document survives to the output with n_spans = 1
    val nSpans = greatest(
      ((size(toks) + (span - 1)) / lit(span)).cast("int"), lit(1))
    val spansCol = transform(sequence(lit(0), nSpans - 1), i =>
      struct(i.as("pos"),
        array_join(slice(toks, i * span + 1, lit(span)), " ").as("s")))
    val exploded = df
      .select(col(idCol), explode(spansCol).as("__sp"))
      .select(col(idCol), col("__sp.pos").as("__pos"), col("__sp.s").as("__s"))
    val firstOcc = Window.partitionBy(contentHash(col("__s")))
      .orderBy(col(idCol), col("__pos"))
    exploded
      .withColumn("__keep", row_number().over(firstOcc) === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("kept_spans"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("__pos"), col("__s"))))),
            x => x("__s")),
          " ").as("clean_text"))
  }

  /** Per-document duplicated-passage coverage — the substring-level
    * duplication profile of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": for each document, the fraction of
    * its k-token shingle positions whose shingle also occurs in at least
    * one OTHER document. Unlike [[ngramJaccardPairs]] (which scores doc
    * PAIRS) this scores each document's own contamination-by-boilerplate,
    * the gate a pipeline uses to drop template-heavy pages outright.
    *
    * Output: one row per input document —
    * (idCol, n_kgrams, n_dup, dup_frac); documents shorter than `k`
    * tokens contribute their whole text as a single shingle (the
    * [[wordShingles]] convention).
    *
    * Scale shape: shingles form map-side (native expression) and are
    * hashed to 60-bit longs BEFORE the explode's groupBy, so both
    * exchanges carry (id, long) pairs — never shingle text. The
    * docs-per-shingle table is one row per distinct shingle — corpus-
    * sized, so the join back is a plain long-key shuffle join by default
    * (`broadcastShingles = true` only for bounded corpora; AQE promotes
    * small sides on its own). Counts partial-aggregate map-side
    * throughout.
    */
  def kgramDupCoverage(df: DataFrame, idCol: String, textCol: String,
      k: Int, broadcastShingles: Boolean = false): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val pos = df
      .select(col(idCol),
        explode(Sketches.wordShingles(split(col(textCol), " "), k)).as("__g"))
      .select(col(idCol), Sampling.keyHash60(col("__g")).as("__h"))
    val perDoc = pos.groupBy(col(idCol), col("__h"))
      .agg(count(lit(1)).as("__tf"))
    val docsPerGram = perDoc.groupBy(col("__h"))
      .agg(count(lit(1)).as("__ndocs"))
    val agg = perDoc
      .join(if (broadcastShingles) broadcast(docsPerGram) else docsPerGram,
        Seq("__h"))
      .groupBy(col(idCol))
      .agg(sum(col("__tf")).as("n_kgrams"),
        sum(when(col("__ndocs") >= 2, col("__tf")).otherwise(0L)).as("n_dup"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_kgrams"), lit(0L)).as("n_kgrams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", col("n_dup").cast("double") /
        greatest(col("n_kgrams"), lit(1L)).cast("double"))
  }

  /** ExactSubstr deduplication (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better"): find every duplicated token
    * span of length >= `minLen` corpus-wide, REMOVE it from all but its
    * first occurrence, and emit the cleaned text — the substring-level
    * complement to document-level MinHash dedup ([[spanDedup]] drops
    * fixed spans; this removes arbitrary-length duplicated runs at
    * token granularity).
    *
    * The L-gram formulation is EXACT for this definition, not a
    * blocking approximation: token t lies inside a duplicated span of
    * length >= L iff some window of L consecutive tokens covering t
    * occurs elsewhere in the corpus, so marking every non-first
    * occurrence of every L-gram and taking the per-document union of
    * its [p, p+L-1] intervals reproduces the duplicated-run set
    * exactly (a run of length M >= L is covered by its M-L+1 grams).
    * "First occurrence" is the global (id, pos) minimum — the
    * [[spanDedup]] keep-first convention, so one carrier of shared
    * boilerplate survives. Documents shorter than L tokens are never
    * rewritten.
    *
    * Output: (idCol, n_tokens, n_removed, n_spans, clean_text) — one
    * row per input document; n_spans counts the merged duplicated
    * runs, a fully-duplicated copy collapses to clean_text = ''.
    *
    * Scale shape: NO pair join exists anywhere. Grams hash map-side to a
    * 120-bit COMPOSITE key — both independent 60-bit halves of one md5
    * digest ([[Sketches.keyHash120]], oracle-exact) — and every exchange,
    * group, and join keys on the (h1, h2) pair. A single 60-bit key would
    * see birthday collisions at corpus scale (>= 1e10 grams → expected
    * ~G²/2^61 ≈ 50 false marks, each silently deleting non-duplicated
    * tokens); at 120 bits the expectation is ~G²/2^121 ≈ 4e-17 — the
    * exactness claim holds for any physically realizable corpus. The
    * first-occurrence table is a partial-aggregating
    * `groupBy(h1, h2).agg(min(struct(id, pos)))` (the skew-safe
    * [[keepCanonicalByKey]] shape: a boilerplate gram with 10^6 copies
    * reduces to one row per map partition BEFORE the exchange — this
    * is why the blocking needs no df cap for SAFETY), and the mark
    * join is an equi-join against that one-row-per-hash side (output
    * linear in gram count; AQE's skew join splits a hot hash's
    * build-stream). Run stitching and text reassembly are per-document
    * expression lambdas over a collect_list bounded by the document's
    * own token count — the [[spanDedup]] reassembly bound. Every
    * exchange carries (id, int, long) rows or per-doc position arrays,
    * never gram text and never the corpus squared. `maxGramDf` (0 =
    * disabled, the repo df-cap convention) is a cost/recall KNOB, not
    * a safety valve: grams hotter than the cap are excluded from
    * marking, leaving their spans in place for a boilerplate pass
    * ([[graft.queries.TextQueries]] `text_boilerplate`) to handle.
    *
    * Reference anchor: the reference engine has no substring dedup;
    * this implements the published ExactSubstr operation
    * (github.com/google-research/deduplicate-text-datasets describes
    * the suffix-array original) in the Spark-native L-gram shape.
    */
  def exactSubstrDedup(df: DataFrame, idCol: String, textCol: String,
      minLen: Int, maxGramDf: Int = 0): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    require(maxGramDf == 0 || maxGramDf >= 2,
      "maxGramDf must be 0 (disabled) or >= 2")
    val L = minLen
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol), col(textCol))
    val grams = base
      .filter(size(toks) >= L)
      .select(col(idCol),
        posexplode(Sketches.wordShingles(toks, L)).as(Seq("__p", "__g")))
      .select(col(idCol), col("__p"),
        Sketches.keyHash120(col("__g")).as("__hh"))
      .select(col(idCol), col("__p"),
        col("__hh").getField("h1").as("__h"),
        col("__hh").getField("h2").as("__h2"))
    val firstAgg = grams.groupBy(col("__h"), col("__h2"))
      .agg(min(struct(col(idCol), col("__p"))).as("__first"),
        count(lit(1)).as("__df"))
    val first =
      (if (maxGramDf == 0) firstAgg
       else firstAgg.filter(col("__df") <= maxGramDf))
        .select(col("__h"), col("__h2"), col("__first"))
    // every non-first occurrence of a duplicated gram marks [p, p+L-1]
    val marked = grams.join(first, Seq("__h", "__h2"))
      .filter(col(idCol) =!= col("__first").getField(idCol) ||
        col("__p") =!= col("__first").getField("__p"))
      .select(col(idCol), col("__p"))
    subtractRuns(base, marked, idCol, textCol, L)
  }

  /** [[exactSubstrDedup]] for the STEADY-STATE ingest flow: clean a new
    * crawl `batch` against an existing kept `corpus` — a batch token
    * run >= `minLen` is removed when it appears anywhere in the corpus
    * (the corpus always outranks the batch: it is already shipped) or
    * earlier in the batch itself (the [[exactSubstrDedup]] keep-first
    * order among batch docs). Only the DELTA is ever rewritten — the
    * same asymmetry as [[incrementalDedupStatus]], at substring
    * granularity.
    *
    * Output: one (idCol, n_tokens, n_removed, n_spans, clean_text) row
    * per BATCH document. Scale shape: corpus grams reduce to a DISTINCT
    * (h1, h2) 120-bit composite-hash pair (one slim exchange over the
    * corpus — in production this gram-hash set is the persisted index,
    * built once and unioned incrementally); batch-side marking is the
    * [[exactSubstrDedup]] shape (same collision bound) over the batch
    * only.
    */
  def exactSubstrDedupIncremental(batch: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame =
    exactSubstrDedupAgainstIndex(batch,
      substrGramIndex(corpus, textCol, minLen), idCol, textCol, minLen)

  /** The PERSISTED gram index behind [[exactSubstrDedupIncremental]]:
    * the DISTINCT (__h, __h2) 120-bit composite gram hashes of `df`'s
    * `textCol`. Build it once from the kept corpus, write it out, and
    * maintain it incrementally — `index.unionByName(substrGramIndex(
    * shippedBatch, ...)).distinct()` after each shipped batch — so no
    * batch ever re-scans the corpus. Feed it to
    * [[exactSubstrDedupAgainstIndex]].
    */
  def substrGramIndex(df: DataFrame, textCol: String,
      minLen: Int): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    val toks = split(col(textCol), " ")
    df.filter(size(toks) >= minLen)
      .select(explode(Sketches.wordShingles(toks, minLen)).as("__g"))
      .select(Sketches.keyHash120(col("__g")).as("__hh"))
      .select(col("__hh").getField("h1").as("__h"),
        col("__hh").getField("h2").as("__h2"))
      .distinct()
  }

  /** [[exactSubstrDedupIncremental]] against a pre-built
    * [[substrGramIndex]] — the steady-state shape where the corpus gram
    * index is maintained as data instead of recomputed: a batch token
    * run >= `minLen` is removed when its gram is in the index or occurs
    * earlier in the batch itself (batch keep-first).
    */
  def exactSubstrDedupAgainstIndex(batch: DataFrame, index: DataFrame,
      idCol: String, textCol: String, minLen: Int): DataFrame = {
    require(minLen >= 2, "minLen must be >= 2")
    val L = minLen
    val toks = split(col(textCol), " ")
    val bg = batch.filter(size(toks) >= L)
      .select(col(idCol),
        posexplode(Sketches.wordShingles(toks, L)).as(Seq("__p", "__g")))
      .select(col(idCol), col("__p"),
        Sketches.keyHash120(col("__g")).as("__hh"))
      .select(col(idCol), col("__p"),
        col("__hh").getField("h1").as("__h"),
        col("__hh").getField("h2").as("__h2"))
    val corpusHashes = index.withColumn("__inc", lit(true))
    val first = bg.groupBy(col("__h"), col("__h2"))
      .agg(min(struct(col(idCol), col("__p"))).as("__first"))
    val marked = bg.join(first, Seq("__h", "__h2"))
      .join(corpusHashes, Seq("__h", "__h2"), "left")
      .filter(coalesce(col("__inc"), lit(false)) ||
        col(idCol) =!= col("__first").getField(idCol) ||
        col("__p") =!= col("__first").getField("__p"))
      .select(col(idCol), col("__p"))
    subtractRuns(batch.select(col(idCol), col(textCol)), marked,
      idCol, textCol, L)
  }

  /** Shared tail of the ExactSubstr family: merge each document's
    * sorted marked gram starts into runs ([p, p+L-1] interval union)
    * and rebuild the text from the gaps — one O(n_tokens) expression
    * fold per document, no explode. `marked` is (idCol, __p).
    */
  private def subtractRuns(base: DataFrame, marked: DataFrame,
      idCol: String, textCol: String, L: Int): DataFrame = {
    val ps = marked.groupBy(col(idCol))
      .agg(array_sort(collect_list(col("__p"))).as("__ps"))
    base.join(ps, Seq(idCol), "left")
      .withColumn("__tk", split(col(textCol), " "))
      .withColumn("__iv", expr(
        s"""aggregate(coalesce(__ps, cast(array() as array<int>)),
           |  cast(array() as array<struct<s:int,e:int>>),
           |  (acc, p) -> CASE
           |    WHEN size(acc) = 0 OR p > element_at(acc, -1).e + 1
           |      THEN concat(acc, array(named_struct('s', p, 'e', p + ${L - 1})))
           |    ELSE concat(slice(acc, 1, size(acc) - 1),
           |      array(named_struct('s', element_at(acc, -1).s,
           |                         'e', p + ${L - 1})))
           |  END)""".stripMargin))
      .withColumn("__pieces", expr(
        """aggregate(__iv,
          |  named_struct('nxt', 0, 'acc', cast(array() as array<string>)),
          |  (st, iv) -> named_struct(
          |    'nxt', iv.e + 1,
          |    'acc', CASE WHEN iv.s > st.nxt
          |      THEN concat(st.acc,
          |        array(array_join(slice(__tk, st.nxt + 1, iv.s - st.nxt), ' ')))
          |      ELSE st.acc END),
          |  st -> CASE WHEN st.nxt < size(__tk)
          |    THEN concat(st.acc,
          |      array(array_join(slice(__tk, st.nxt + 1, size(__tk) - st.nxt), ' ')))
          |    ELSE st.acc END)""".stripMargin))
      .select(col(idCol),
        size(col("__tk")).cast("long").as("n_tokens"),
        expr("aggregate(__iv, CAST(0 AS BIGINT), " +
          "(a, iv) -> a + CAST(iv.e - iv.s + 1 AS BIGINT))").as("n_removed"),
        size(col("__iv")).cast("long").as("n_spans"),
        array_join(col("__pieces"), " ").as("clean_text"))
  }

  /** Word n-gram shingles as an array column: shingle i =
    * words[i..i+n-1] joined by spaces. Evaluated by the native
    * [[WordShinglesExpr]] — the declarative `transform(sequence, i ->
    * concat_ws(slice))` formulation is semantically identical but its
    * lambdas are interpreted, and profiling showed it dominating every
    * shingle-based dedup query (~6 µs/row vs ~0.3 µs native).
    */
  def wordShingles(text: Column, n: Int): Column =
    Sketches.wordShingles(split(text, " "), n)

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 — the MOSS algorithm): hash every word k-gram, slide a
    * w-wide window over the hash sequence, keep each window's minimum.
    * The guarantee the paper proves: any substring match of at least
    * k + w - 1 words between two documents shares at least one
    * fingerprint, at ~2/(w+1) the density of the full shingle set —
    * this is the passage-level detector (plagiarism/clone/quote
    * finding) where MinHash answers "how similar overall" but cannot
    * say WHICH passages collide.
    *
    * Output: distinct `(idCol, fingerprint)` rows — the inverted-index
    * form; documents sharing a passage join on the fingerprint key.
    * Hashes are the cross-engine 60-bit md5 ([[Sampling.keyHash60]]),
    * so the fingerprint set is oracle-exact.
    *
    * Scale shape: shingling, hashing, window minima and the per-doc
    * dedup all run in the scan's project via the native [[WinnowExpr]]
    * (one tight loop per row — the declarative transform/array_min/
    * slice formulation is semantically identical but interpreted, and
    * measured 17.7 s vs sub-second at sf0.1); the only explode is the
    * final fingerprint generator (~2·len/(w+1) rows per doc after
    * dedup). Documents shorter than k words degrade to one whole-text
    * shingle exactly as [[wordShingles]] does.
    */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    val fps = Sketches.winnowFingerprints(wordShingles(col(textCol), k), w)
    df.select(col(idCol), explode(fps).as("fingerprint"))
  }

  /** Clone/plagiarism candidate pairs from [[winnowFingerprints]] — the
    * end use of the MOSS sketch: documents sharing >= `minShared`
    * fingerprints, with each side's fingerprint count for
    * containment-style normalization downstream
    * (`n_shared / least(n_a, n_b)`). Because every >= k+w-1-word shared
    * passage contributes a common fingerprint, a pair's `n_shared`
    * tracks how much TEXT the documents share, not how similar their
    * token distributions are — quotes and boilerplate-free partial
    * copies surface here that MinHash's global Jaccard misses.
    *
    * Scale shape: same df-capped blocking as [[ngramJaccardPairs]] —
    * fingerprints in more than `maxFpDf` documents are boilerplate and
    * are dropped BEFORE the self-join, so one hot fingerprint can never
    * own the job with a df² candidate blow-up; the join keys on the
    * fingerprint, candidate fan-out <= maxFpDf per key. Per-doc sizes
    * are computed AFTER the df cap (the [[ngramJaccardPairs]]
    * convention), so `n_shared / least(n_a, n_b)` reaches exactly 1.0
    * for full containment regardless of how much boilerplate the docs
    * carry. The fingerprint frame and its df-capped projection are each
    * eagerly localCheckpointed once — Spark shares no common subtrees,
    * and without the barrier the explode would re-run once per
    * downstream reference (sizes + both self-join sides). All groupBys
    * partial-aggregate.
    *
    * Output: (id_a, id_b, n_shared, n_a, n_b), id_a < id_b.
    */
  def winnowPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5, w: Int = 4, minShared: Int = 2,
      maxFpDf: Int = 100): DataFrame = {
    require(minShared >= 1 && maxFpDf >= 1, "need minShared, maxFpDf >= 1")
    val fp = winnowFingerprints(df, idCol, textCol, k, w)
      .withColumnRenamed(idCol, "id")
      .localCheckpoint()
    val rare = fp.join(
      fp.groupBy(col("fingerprint")).agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= maxFpDf).select("fingerprint"),
      Seq("fingerprint"))
      .localCheckpoint()
    val sizes = rare.groupBy(col("id")).agg(count(lit(1)).as("n_fps"))
    rare.as("x").join(rare.as("y"),
        col("x.fingerprint") === col("y.fingerprint") &&
          col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("id").as("id_a"), col("n_fps").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_fps").as("n_b")), Seq("id_b"))
      .select("id_a", "id_b", "n_shared", "n_a", "n_b")
  }

  /** MinHash parameters: k permutations h_i(x) = (a_i * x + b_i) mod p
    * over shingle hashes. Mersenne prime keeps products in Long range
    * after the inner pmod.
    */
  val MinHashPrime: Long = 2147483647L
  def perm(i: Int): (Long, Long) =
    (2L * i + 1, 104729L * (i + 1) % MinHashPrime) // odd multiplier, fixed offsets

  /** k-wide MinHash signature per document, evaluated by the native
    * per-row [[MinHashSigExpr]] — a sketch is a pure function of one
    * document, so it runs inside the scan's project with NO exchange.
    * (The earlier explode+groupBy formulation shuffled every shingle of
    * the corpus just to reduce it back to one row per doc; a
    * higher-order-function formulation is interpreted and ~20× slower.)
    *
    * Output: (id, mh0..mh{k-1}) plus an `sig` array column.
    */
  def withMinHashSignature(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, useMd5: Boolean = false): DataFrame =
    // two-step select: the signature is evaluated once per row (array
    // extraction is cheap, so unpacking it k ways costs nothing; Catalyst
    // keeps the non-cheap sketch un-inlined across the projections)
    df.select(col(idCol).as("id"),
        Sketches.minHashSig(wordShingles(col(textCol), shingleN), k, useMd5).as("sig"))
      .select(col("id") +: (0 until k).map(i => col("sig")(i).as(s"mh$i"))
        :+ col("sig"): _*)

  /** Candidate near-dup pairs via LSH bucket self-join — the scale path:
    * the only shuffle is on (band, bucket), never all-pairs.
    * bands=8/rows=2: P(collide) = 1-(1-j^2)^8 ≈ 0.9997 at j=0.8 — high
    * recall; false-positive candidates are cheap (verified downstream).
    *
    * `useMd5` makes the whole pipeline cross-engine deterministic: the
    * shingle hash switches to md5 and the band bucket key becomes the
    * band's signature values joined as a string (instead of their
    * xxhash64), so a DuckDB oracle reproduces the exact pair set.
    */
  /** One (id, band, bucket) row per document per LSH band — the shared
    * bucket stream behind the self-join pair generator and the
    * cross-corpus incremental path.
    */
  private[functions] def bandBuckets(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, k: Int, bands: Int,
      useMd5: Boolean): DataFrame = {
    val rows = k / bands
    val sig = withMinHashSignature(df, idCol, textCol, shingleN, k, useMd5)
    val bandKeys = (0 until bands).map { b =>
      val cols = (b * rows until (b + 1) * rows).map(i => col(s"mh$i"))
      // md5 mode joins on the literal value string — exact, mirrorable;
      // default mode compresses the band key through xxhash64
      if (useMd5) concat_ws(":", cols: _*)
      else xxhash64(lit(b) +: cols: _*).cast("string")
    }
    sig.select(col("id"),
      posexplode(array(bandKeys: _*)).as(Seq("band", "bucket")))
  }

  def minHashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 8,
      useMd5: Boolean = false): DataFrame = {
    val buckets = bandBuckets(df, idCol, textCol, shingleN, k, bands, useMd5)
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
  }

  /** Sketch-quality evaluation — precision/recall of a candidate pair
    * set against an exact truth set, as one number row: the "measure,
    * don't guess" harness for tuning LSH knobs (bands, bits, df caps)
    * in-pipeline rather than in a notebook. Both inputs are (id_a,
    * id_b) frames with id_a < id_b.
    *
    * Scale shape: one full-outer join on the pair key (both sides
    * already deduplicated pair sets — far smaller than the corpus),
    * then a single partial-aggregated count row. Ratios divide exact
    * longs; empty sides yield 0, never NaN.
    */
  def sketchEval(cand: DataFrame, truth: DataFrame): DataFrame = {
    val j = cand.select(col("id_a"), col("id_b"), lit(true).as("__c"))
      .join(truth.select(col("id_a"), col("id_b"), lit(true).as("__t")),
        Seq("id_a", "id_b"), "full_outer")
    j.agg(
        sum(when(col("__c").isNotNull, 1L).otherwise(0L)).as("n_candidates"),
        sum(when(col("__t").isNotNull, 1L).otherwise(0L)).as("n_truth"),
        sum(when(col("__c").isNotNull && col("__t").isNotNull, 1L)
          .otherwise(0L)).as("tp"))
      .withColumn("fp", col("n_candidates") - col("tp"))
      .withColumn("fn", col("n_truth") - col("tp"))
      .withColumn("precision",
        when(col("n_candidates") > 0,
          col("tp").cast("double") / col("n_candidates").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("recall",
        when(col("n_truth") > 0,
          col("tp").cast("double") / col("n_truth").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Incremental dedup — classify a NEW batch of documents against an
    * existing deduplicated snapshot, the standard production flow: a
    * 100 TB corpus is deduplicated once; each day's crawl delta is
    * checked against it, never the corpus against itself again.
    *
    * Per batch document: `exact_dup` (content hash present in the
    * snapshot), else `near_dup` (shares at least one MinHash LSH band
    * bucket with any snapshot document), else `new`. Output:
    * (id, status), one row per batch document.
    *
    * Scale shape: both probes are LEFT-SEMI joins keyed on the hash /
    * (band, bucket) — the snapshot side reduces to distinct keys
    * (partial-aggregated map-side), the batch side ships one 32-byte
    * hash and `bands` bucket keys per document, and nothing is ever
    * quadratic. The snapshot's bucket stream is exactly what a
    * persisted LSH index would hold, so at steady state the heavy side
    * is a pre-computed table scan.
    */
  def incrementalDedupStatus(snapshot: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3, k: Int = 16,
      bands: Int = 8, useMd5: Boolean = false): DataFrame = {
    val snapH = snapshot.select(contentHash(col(textCol)).as("__h")).distinct()
    val batchH = batch.select(col(idCol).as("id"),
      contentHash(col(textCol)).as("__h"))
    val exactIds = batchH.join(snapH, Seq("__h"), "left_semi")
      .select(col("id")).withColumn("__exact", lit(true))
    val snapBuckets =
      bandBuckets(snapshot, idCol, textCol, shingleN, k, bands, useMd5)
        .select(col("band"), col("bucket")).distinct()
    val nearIds =
      bandBuckets(batch, idCol, textCol, shingleN, k, bands, useMd5)
        .join(snapBuckets, Seq("band", "bucket"), "left_semi")
        .select(col("id")).distinct().withColumn("__near", lit(true))
    batch.select(col(idCol).as("id"))
      .join(exactIds, Seq("id"), "left")
      .join(nearIds, Seq("id"), "left")
      .select(col("id"),
        when(col("__exact"), "exact_dup")
          .when(col("__near"), "near_dup")
          .otherwise("new").as("status"))
  }

  /** Exact n-gram Jaccard similarity for a set of candidate pairs:
    * explode distinct shingles, self-join on shingle (the blocking key),
    * count intersections, join shingle-set sizes. Fully SQL-expressible
    * (the oracle mirrors it shingle-for-shingle, cap included).
    *
    * `maxShingleDf` caps the blocking key's document frequency: a shingle
    * appearing in d documents contributes d² candidate rows, so one
    * boilerplate shingle (license header, nav bar) can own the whole job
    * on a skewed corpus. Shingles with df > cap are dropped from the
    * shingle SETS (sizes and intersections alike), i.e. Jaccard is
    * computed over the capped shingle space — the standard trick, which
    * also improves precision since ubiquitous shingles carry no signal.
    * The df count partitions by shingle, the same key the self-join
    * shuffles on, so the exchange is reused. 0 disables the cap.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.5,
      maxShingleDf: Int = 0): DataFrame =
    shinglePairStats(df, idCol, textCol, shingleN, maxShingleDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "n_common", "n_a", "n_b", "jaccard")

  /** Asymmetric CONTAINMENT pairs: |A∩B| / |A| and / |B| over the same
    * capped shingle space as [[ngramJaccardPairs]], kept when either
    * direction reaches `minContainment`. Jaccard misses subset
    * relationships (a paragraph quoted inside a much longer page scores
    * |∩|/|union| ≈ 0); containment is the standard detector for
    * quotes, wrappers, and page-of-boilerplate-plus-payload shapes.
    * Same plan as the Jaccard variant — shingle-key self-join, never
    * all-pairs; df cap governs candidate volume identically.
    */
  def ngramContainmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minContainment: Double = 0.9,
      maxShingleDf: Int = 0): DataFrame =
    shinglePairStats(df, idCol, textCol, shingleN, maxShingleDf)
      .withColumn("containment_a",
        col("n_common").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_b",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("containment_a"), col("containment_b")) >=
        minContainment)
      .select("id_a", "id_b", "n_common", "n_a", "n_b",
        "containment_a", "containment_b")

  /** TF-weighted sparse-vector cosine pairs — the bag-of-words
    * similarity that SET-based measures miss: two docs repeating the
    * same rare vocabulary with different n-gram order score high here
    * and low on shingle Jaccard (template re-fills, shuffled
    * concatenations, translations sharing names/numbers). Classic
    * sparse cosine via the inverted-index join: dot(a, b) =
    * Σ_term tf_a·tf_b over SHARED terms only.
    *
    * Exactness: tf products and squared norms are integer sums;
    * `sim = dot / (√n2_a · √n2_b)` is then three IEEE ops on exact
    * integers — bit-identical in DuckDB, so the threshold filter can
    * never disagree cross-engine. Norms are computed AFTER the df cap
    * (the [[ngramJaccardPairs]] convention), so identical docs score
    * exactly 1.0 however much boilerplate vocabulary they carry.
    *
    * Scale shape: the (id, term, tf) frame partial-aggregates in one
    * exchange; terms in more than `maxTermDf` docs ("the") drop BEFORE
    * the self-join, bounding per-key fan-out exactly like the shingle
    * df cap; the capped frame localCheckpoints once (it feeds norms +
    * both join sides). Text never crosses an exchange.
    */
  def tfCosinePairs(df: DataFrame, idCol: String, textCol: String,
      minSim: Double = 0.5, maxTermDf: Int = 100): DataFrame = {
    require(maxTermDf >= 1, "maxTermDf must be >= 1")
    val tf = df.select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint() // the df-count subtree reads it twice
    val rare = tf.join(
        tf.groupBy(col("term")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxTermDf).select("term"),
        Seq("term"))
      .localCheckpoint()
    val norms = rare.groupBy(col("id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    rare.as("x").join(rare.as("y"),
        col("x.term") === col("y.term") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(sum(col("x.tf") * col("y.tf")).as("dot"))
      .join(norms.select(col("id").as("id_a"), col("n2").as("n2_a")), Seq("id_a"))
      .join(norms.select(col("id").as("id_b"), col("n2").as("n2_b")), Seq("id_b"))
      .withColumn("sim", col("dot").cast("double") /
        (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .filter(col("sim") >= minSim)
      .select("id_a", "id_b", "dot", "n2_a", "n2_b", "sim")
  }

  /** Shared pair-statistics subtree of the shingle-set similarity
    * family: distinct (id, shingle) pairs (df-capped), per-doc set
    * sizes, and per-pair intersection counts via the shingle-key
    * self-join. Returns (id_a, id_b, n_common, n_a, n_b).
    */
  private def shinglePairStats(df: DataFrame, idCol: String,
      textCol: String, shingleN: Int, maxShingleDf: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // shingles stay TEXT here, deliberately: the md5-based 60-bit hash
    // (the sourceOverlap shape) was tried in round 10 and measured a
    // net loss at bench scale — the per-shingle md5 costs more than the
    // narrower exchange saves (1.70 s vs 1.39 s on dedup_ngram_pairs,
    // sf0.1 min-of-5). At larger scale the trade tilts back; revisit
    // with a cheaper cross-engine hash if one lands in both engines.
    val sh0 = df.select(col(idCol).as("id"),
        explode(wordShingles(col(textCol), shingleN)).as("shingle"))
      .distinct()
    // the (df-capped) shingle frame feeds THREE downstream references
    // (sizes + both self-join sides); Spark shares no common subtrees,
    // so without the one-shot materialization the shingle explode +
    // distinct (+ df window) would run three times — the same barrier
    // sourceOverlap and winnowPairs carry
    val sh = (
      if (maxShingleDf > 0)
        sh0.withColumn("__df",
            count(lit(1)).over(Window.partitionBy("shingle")))
          .filter(col("__df") <= maxShingleDf)
          .drop("__df")
      else sh0
    ).localCheckpoint()
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_shingles", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_shingles", "n_b"), "id_b")
  }

  /** MinHash Jaccard estimate from two k-wide signatures: the fraction of
    * equal components (an unbiased estimator of the true Jaccard, stderr
    * ≈ 1/√k). This is what makes MinHash a SKETCH: similarity of two
    * documents from 2k longs, never re-touching their shingles. Unrolled
    * comparison chain — codegen'd, no higher-order functions.
    */
  def minHashJaccardEstimate(sigA: Column, sigB: Column, k: Int = 16): Column =
    (0 until k).map(i => when(sigA(i) === sigB(i), 1.0).otherwise(0.0))
      .reduce(_ + _) / k

  /** Duplicate CLUSTERS from near-dup pairs: connected components with
    * the component's smallest id as the cluster label — what a dedup
    * pipeline actually needs downstream of pair generation (keep one
    * representative per cluster, not per pair; A~B and B~C must collapse
    * to one group even when A~C was never emitted).
    *
    * Min-label propagation to a fixpoint with an ACTIVE FRONTIER plus
    * per-round POINTER HALVING, FUSED into one lookup join + one
    * aggregation per round. Propagation: a label can only lower a
    * neighbor's label in the round after it moved, so edge offers are
    * filtered to labels that changed last round (initially the nodes
    * whose fused-init label dropped below their id). Halving: each
    * round every node also adopts its label's label (`lbl ← lbl(lbl)` —
    * labels are node ids, so the lookup always lands), the
    * pointer-jumping step of parallel connectivity algorithms (Shiloach–
    * Vishkin; the same device that gives MapReduce CC algorithms à la
    * Kiveris et al.'s two-phase/large-star their round bound). Plain
    * propagation needs diameter rounds — a 1000-link chain of near-dup
    * docs takes 1000 rounds; with halving the label-pointer chains halve
    * while propagation extends them, so the distance a label covers
    * doubles per round and convergence is O(log diameter) rounds
    * regardless of component shape. Both lookups (edge offers keyed on
    * the neighbor id, pointer offers keyed on the current label) share
    * ONE join against the persisted label frame, and the node's own
    * label enters the min-aggregation as a direct self offer — so a
    * round is exactly one join + one groupBy, not the three joins the
    * unfused shape paid (frontier propagation, halving self-join,
    * candidate attach-back). Fixpoint is reached iff no label moves
    * (any improvement — propagated or halved — re-enters the frontier
    * set and is re-offered, so a moveless round certifies stability),
    * bounded by `maxIters`. Output: (id, cluster_id) for every id
    * appearing in a pair.
    *
    * Lineage: each round's plan references the previous round's labels
    * AND frontier, so Catalyst's analysis cost doubles per round if never
    * truncated. Rather than checkpointing every round (which pushed the
    * measured floor from ~2.3 s to ~5.7+ s — block storage per round is
    * not free), intermediate rounds only `persist()` and the lineage is
    * cut every `checkpointEvery` rounds (analysis ≤ 2^checkpointEvery ×
    * base, a constant). `localCheckpoint` stores blocks on executors and
    * is NOT recomputable: on a cluster with dynamic allocation /
    * decommissioning, losing an executor mid-propagation fails the job.
    * Pass `reliable = true` (after `sparkContext.setCheckpointDir`) to
    * use fault-tolerant reliable checkpoints for long cluster runs; the
    * default keeps the fast executor-local path for short-lived jobs.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 10,
      checkpointEvery: Int = 3, reliable: Boolean = false): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    // persist the pair source FIRST: the symmetrized union below reads it
    // twice, and Spark does not share common subtrees across union
    // branches — without the persist an expensive upstream pair pipeline
    // (e.g. shingle-blocked Jaccard) runs twice
    val fwd = pairs.select(col("id_a").as("src"), col("id_b").as("dst")).persist()
    // NOTE: no fwd.isEmpty early-return — the empty pair set (the normal
    // healthy case) flows through naturally: the fused init produces an
    // empty state, the frontier count is 0, the loop never runs and the
    // final select returns the empty (id, cluster_id) frame. The explicit
    // probe was an extra ACTION that paid the whole upstream pair
    // pipeline's map stages once more per query (measured ~0.4 s on the
    // shingle-blocked Jaccard callers) for a case the loop already
    // handles.
    val edges = fwd.unionByName(
        fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    // reliable checkpoints re-run the plan to write checkpoint files at
    // the end of the materializing job; persisting the frame first makes
    // that second pass a cache read instead of a full recompute. The aux
    // persists drain with sinceCut once the checkpoint is materialized.
    var auxPersists: List[DataFrame] = Nil
    def cut(df: DataFrame): DataFrame =
      if (reliable) {
        val cached = df.persist()
        auxPersists ::= cached
        cached.checkpoint(false)
      } else df.localCheckpoint(false)
    // first propagation round fused into initialization: lbl = min(self,
    // neighbors) in the same aggregation that enumerates the nodes;
    // __moved marks the initial frontier (label already below own id).
    // All checkpoints/persists here are LAZY — each round's single
    // `count` action materializes them, so a round stays ONE job.
    var state = cut(edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("__mn"))
      .select(col("id"), least(col("id"), col("__mn")).as("lbl"),
        (col("__mn") < col("id")).as("__moved")))
    var nMoved = state.filter(col("__moved")).count()
    // persisted intermediate rounds stay alive until the NEXT checkpoint
    // truncates the lineage past them (a persist's recompute path reaches
    // back to the last cut, so freeing it earlier would be unsafe on a
    // cluster that can lose cached blocks)
    var sinceCut: List[DataFrame] = Nil
    var iter = 1
    while (iter < maxIters && nMoved > 0) {
      // FUSED propagation + pointer halving: ONE lookup join + ONE
      // aggregation per round (previously three joins — frontier
      // propagation, halving self-join, candidate attach-back). All
      // lookups read the PRE-round state. Offers to node u:
      //   - edge offers: lbl(w) for each neighbor w that moved last
      //     round (a label can only improve a neighbor in the round
      //     after it moved, so non-moved labels were already offered);
      //   - pointer offer: lbl(lbl(u)) — the halving hop, now from
      //     round 1 (it shares the lookup join, so it no longer costs
      //     the extra self-join that round 1 used to skip);
      //   - self offer: u's own lbl, injected straight into the
      //     aggregation so the new state needs no join back against
      //     the old one (min(__v) over {self, pointer, edge offers}
      //     = the old least(lbl, halved, cand); the self row also
      //     carries the old label out for the __moved flag).
      // The pointer lookup always lands (labels are node ids, every
      // node id is a state key), so the inner join drops nothing the
      // old left_outer + coalesce kept.
      val lkp = state.select(col("id").as("__k"), col("lbl").as("__v"),
        col("__moved").as("__mv"))
      val reqs = edges
        .select(col("dst").as("__k"), col("src").as("__u"),
          lit(false).as("__ptr"))
        .unionByName(state.select(col("lbl").as("__k"),
          col("id").as("__u"), lit(true).as("__ptr")))
      val offers = reqs.join(lkp, Seq("__k"))
        .filter(col("__ptr") || col("__mv"))
        .select(col("__u"), col("__v"), lit(false).as("__self"))
        .unionByName(state.select(col("id").as("__u"),
          col("lbl").as("__v"), lit(true).as("__self")))
      val stepped = offers.groupBy(col("__u"))
        .agg(min(col("__v")).as("lbl"),
          min(when(col("__self"), col("__v"))).as("__old"))
        .select(col("__u").as("id"), col("lbl"),
          (col("lbl") < col("__old")).as("__moved"))
      val isCut = iter % checkpointEvery == 0
      state = if (isCut) cut(stepped) else stepped.persist()
      nMoved = state.filter(col("__moved")).count() // ONE action: materializes this round's state
      if (isCut) {
        sinceCut.foreach(_.unpersist()); sinceCut = Nil
        auxPersists.foreach(_.unpersist()); auxPersists = Nil
      } else sinceCut ::= state
      iter += 1
    }
    fwd.unpersist()
    edges.unpersist()
    // the loop can exit on a non-cut round: free the persisted
    // intermediates it left behind — except the final state itself,
    // which the caller consumes
    sinceCut.filterNot(_ eq state).foreach(_.unpersist())
    auxPersists.foreach(_.unpersist())
    if (nMoved > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"dupClusters: labels still moving after maxIters=$maxIters rounds " +
          "(component diameter exceeds ~2^maxIters) — cluster_ids may " +
          "split one true component into several; raise maxIters")
    state.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Dedup IMPACT report — the "what does deduplication buy me" table a
    * dataset card needs before committing to a dedup pass: connected
    * components over the near-dup `pairs` ([[dupClusters]]), singletons
    * included, rolled up by cluster size with the docs and tokens a
    * keep-the-smallest-id policy removes. `tokens_saved` counts every
    * non-canonical member's tokens (the canonical doc's tokens are
    * kept).
    *
    * Output: (cluster_size, n_clusters, docs_removed, tokens_saved).
    *
    * Scale shape: membership joins on the doc id (shuffle join — no
    * broadcast hint, membership is corpus-sized on a duplicated
    * corpus); the per-cluster agg partial-aggregates to one row per
    * cluster; the histogram agg is a handful of rows. The member frame
    * is localCheckpointed once — it feeds both the per-cluster agg and
    * the canonical-token lookup, and recomputing it would re-run the
    * whole pair pipeline + label propagation twice.
    */
  def dedupSavings(corpus: DataFrame, idCol: String, nTokens: Column,
      pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    val base = corpus.select(col(idCol).as("id"),
      nTokens.cast("long").as("n_tokens"))
    val member = base.join(dupClusters(pairs, maxIters), Seq("id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
      .localCheckpoint()
    val per = member.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("sz"), sum(col("n_tokens")).as("tok"),
        min(col("id")).as("canon"))
    per.join(member.select(col("id").as("canon"),
        col("n_tokens").as("canon_tok")), Seq("canon"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("sz") - 1).as("docs_removed"),
        sum(col("tok") - col("canon_tok")).as("tokens_saved"))
  }

  /** 64-bit SimHash per document, evaluated by the native per-row
    * [[SimHash64Expr]]: bit-sign counters over xxhash64(token) in one
    * tight loop inside the scan's project — no explode, no exchange.
    * (The earlier explode + 64-sign-aggregate shape shuffled the whole
    * tokenized corpus to compute a per-document value.)
    */
  def withSimHash(df: DataFrame, idCol: String, textCol: String,
      useMd5: Boolean = false): DataFrame =
    df.select(col(idCol).as("id"),
      Sketches.simhash64(TextAnalysis.tokens(col(textCol)), useMd5).as("simhash"))

  /** SimHash near-dup pairs: band the 64 bits into 4×16-bit chunks as LSH
    * keys (hamming-distance ≤ 3 dups almost surely share a chunk), then
    * verify with bit_count(xor) — join is blocked, never all-pairs.
    * `useMd5` switches the token hash to the cross-engine md5 variant so
    * the result is DuckDB-reproducible (banding/verify are plain SQL).
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, useMd5: Boolean = false): DataFrame = {
    val sh = withSimHash(df, idCol, textCol, useMd5)
    val chunks = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "key")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Sorted-neighborhood near-dup detection (Hernández–Stolfo SNM):
    * sort the corpus by SimHash and compare each document only with its
    * `window` successors in that order — O(n·w) comparisons instead of
    * a pair join, the standard alternative to LSH banding when a single
    * corpus-wide pass is preferred. Near-identical documents have
    * near-identical SimHashes, so they sort adjacent; `hamming ≤
    * maxHamming` verifies each candidate.
    *
    * The global sort position is computed WITHOUT a single-partition
    * window ([[Packing.concatOffsetsGlobal]]'s two-phase shape): the
    * top `bucketBits` of the SimHash range-partition the sort — within
    * a bucket, signed and unsigned long order coincide (the sign bit is
    * part of the bucket for any bucketBits ≥ 1), so a per-bucket
    * row_number plus a cumulative per-bucket base (ONE ROW PER BUCKET
    * through the no-partition window) yields the exact unsigned-order
    * global rank. Candidate pairs are then `rank → rank+i` equi-joins:
    * each row fans out `window` probe tuples of (rank, id, simhash) —
    * 24 bytes each, the text never shuffles.
    *
    * Output: (id_a, id_b, rank_dist, hamming) with id_a < id_b, one row
    * per surviving pair (a fixed pair has exactly one rank distance —
    * no distinct needed).
    */
  def sortedNeighborDups(df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, maxHamming: Int = 3, bucketBits: Int = 8,
      useMd5: Boolean = false): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(bucketBits >= 1 && bucketBits <= 32, "bucketBits in [1,32]")
    import org.apache.spark.sql.expressions.Window
    val sh = withSimHash(df, idCol, textCol, useMd5)
      .withColumn("__b", shiftrightunsigned(col("simhash"), 64 - bucketBits))
    val wLoc = Window.partitionBy(col("__b"))
      .orderBy(col("simhash"), col("id"))
    val local = sh.withColumn("__lrn", row_number().over(wLoc).cast("long"))
    // per-bucket counts cumsum to each bucket's global base — the
    // no-partition window sees one row per non-empty bucket only
    val wBase = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = sh.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(sum(col("__c")).over(wBase), lit(0L)))
      .select(col("__b"), col("__base"))
    val ranked = local.join(broadcast(bases), Seq("__b"))
      .select(col("id"), col("simhash"), (col("__base") + col("__lrn")).as("rn"))
    val probes = ranked.select(col("id").as("__ida"),
        col("simhash").as("__sa"), col("rn"),
        explode(array((1 to window).map(lit): _*)).as("rank_dist"))
      .withColumn("rn", col("rn") + col("rank_dist"))
    probes.join(ranked, Seq("rn"))
      .select(least(col("__ida"), col("id")).as("id_a"),
        greatest(col("__ida"), col("id")).as("id_b"), col("rank_dist"),
        bit_count(col("__sa").bitwiseXOR(col("simhash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** EXACT set-similarity self-join with prefix filtering — the
    * AllPairs/PPJoin family (Bayardo, Ma & Srikant 2007, "Scaling up
    * all pairs similarity search"; Xiao et al. 2008): every document
    * pair with token-set Jaccard ≥ `threshold`, found WITHOUT
    * probabilistic recall loss (MinHash trades recall for speed; this
    * trades nothing and still never goes all-pairs).
    *
    * The filter: order the token universe rarest-first (global df, ties
    * by term), so each document's tokens sort into a canonical list of
    * length L. If two sets have Jaccard ≥ t, their overlap is ≥
    * ⌈t·L⌉ for either side's L, so each side must hit the other inside
    * its first L − ⌈t·L⌉ + 1 tokens — BY PIGEONHOLE a qualifying pair
    * shares at least one PREFIX token. Candidates come from an
    * equi-join on prefix tokens only; rarest-first ordering makes those
    * the lowest-df tokens in each document, which is what keeps the
    * blocking buckets small. Each candidate then verifies the true
    * overlap with an exact intersection count.
    *
    * `maxPrefixDf` is the fan-out cap on the blocking join (the
    * maxShingleDf convention): prefix tokens with df above the cap are
    * dropped from CANDIDATE GENERATION (verification is unaffected), so
    * a pair whose every shared prefix token is hot can be missed — the
    * documented trade; 0 disables.
    *
    * Scale shape: the corpus-sized exchanges carry (doc, term-id,
    * position) tuples; the candidate join is keyed on prefix tokens;
    * the verification join is keyed on candidate doc ids. Text never
    * shuffles. Output: (id_a, id_b, inter, l_a, l_b, jaccard), id_a <
    * id_b, jaccard = inter / (l_a + l_b − inter) as one IEEE division.
    */
  def prefixJaccardDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, maxPrefixDf: Int = 0,
      shingleN: Int = 1): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold in (0,1]")
    require(shingleN >= 1, "shingleN must be >= 1")
    // the "tokens" of the set are word n-gram shingles for n > 1 —
    // unigram sets saturate on small vocabularies (every document looks
    // like every other); shingles restore discrimination
    val toks =
      if (shingleN <= 1) TextAnalysis.tokens(col(textCol))
      else wordShingles(col(textCol), shingleN)
    // the term frame feeds FOUR downstream references (df counts, the
    // ranked prefix, and both verification sides); Spark shares no
    // common subtrees, so the shingle explode + distinct would run four
    // times without the one-shot materialization — the shinglePairStats
    // barrier
    val tok = df
      .select(col(idCol).as("id"), explode(toks).as("term"))
      .distinct()
      .localCheckpoint()
    val tdf = tok.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__df"), col("term"))
    val ranked = tok.join(tdf, Seq("term"))
      .withColumn("__pos", row_number().over(wRank).cast("long"))
      .withColumn("__len",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))))
    // prefix length L − ⌈tL⌉ + 1; ceil of a double that is exact for
    // these magnitudes, identical cross-engine
    val prefix = ranked
      .filter(col("__pos") <=
        col("__len") - ceil(lit(threshold) * col("__len")) + 1)
      .select(col("term"), col("id"), col("__len"), col("__df"))
    val blocked =
      if (maxPrefixDf > 0) prefix.filter(col("__df") <= maxPrefixDf)
      else prefix
    val cand = blocked.as("x").join(blocked.as("y"),
        col("x.term") === col("y.term") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.__len").as("l_a"), col("y.__len").as("l_b"))
      .distinct()
    val inter = cand
      .join(tok.select(col("id").as("id_a"), col("term")), Seq("id_a"))
      .join(tok.select(col("id").as("id_b"), col("term")),
        Seq("id_b", "term"))
      .groupBy(col("id_a"), col("id_b"), col("l_a"), col("l_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .withColumn("jaccard", col("inter").cast("double") /
        (col("l_a") + col("l_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("l_a"),
        col("l_b"), col("jaccard"))
  }

  /** LSH S-curve audit — the tuning report for MinHash banding knobs
    * (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets" ch. 3):
    * for candidate probability P(j) = 1 − (1 − j^rows)^bands, compare
    * the ANALYTIC expectation against the OBSERVED candidate hit rate
    * per Jaccard decile, over a truth set of exact-Jaccard pairs. A
    * healthy banding shows observed ≈ expected; a gap flags broken
    * hashing or a df cap eating recall — measured in-pipeline, not in
    * a notebook.
    *
    * Determinism: P(j) is an UNROLLED left-associated product chain
    * (j·j … , then (1−j^rows) multiplied bands−1 times) — a fixed IEEE
    * dag both engines evaluate identically; expectations sum in 2^40
    * fixed point. `truth` carries (id_a, id_b, jaccard); `cand`
    * carries (id_a, id_b).
    *
    * Scale shape: one left join on the pair key (two pair sets, far
    * smaller than the corpus), one partial-aggregating groupBy on the
    * 10-row bin key.
    */
  def lshSCurve(truth: DataFrame, cand: DataFrame, bands: Int,
      rows: Int): DataFrame = {
    require(bands >= 1 && rows >= 1, "bands and rows must be >= 1")
    val scale = math.pow(2, 40)
    val jr = (1 until rows).foldLeft(col("jaccard"))(
      (acc, _) => acc * col("jaccard"))
    val flagged = truth
      .join(cand.select(col("id_a"), col("id_b"), lit(1L).as("__c")),
        Seq("id_a", "id_b"), "left")
      .withColumn("__q", lit(1.0) - jr)
    val qb = (1 until bands).foldLeft(col("__q"): Column)(
      (acc, _) => acc * col("__q"))
    flagged
      .withColumn("__p40", floor((lit(1.0) - qb) * lit(scale)))
      .withColumn("bin",
        least(floor(col("jaccard") * 10).cast("long"), lit(9L)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("__c"), lit(0L))).as("observed_caught"),
        sum(col("__p40")).as("__e40"))
      .select(col("bin"), col("n_pairs"), col("observed_caught"),
        (col("observed_caught").cast("double") /
          col("n_pairs").cast("double")).as("observed_recall"),
        (col("__e40").cast("double") / lit(scale) /
          col("n_pairs").cast("double")).as("expected_recall"))
  }

  /** DuckDB mirror of [[prefixJaccardDups]]: same rarest-first rank,
    * same prefix bound, same df cap on candidate generation, same
    * exact verification. `docsSql` selects columns `id, text`.
    */
  def prefixJaccardDupsSql(docsSql: String, threshold: Double,
      maxPrefixDf: Int = 0, shingleN: Int = 1): String = {
    val capPred = if (maxPrefixDf > 0) s" AND df <= $maxPrefixDf" else ""
    val termsSql =
      if (shingleN <= 1)
        s"""SELECT DISTINCT id, unnest(string_split(text, ' ')) AS term
           |  FROM ($docsSql)""".stripMargin
      else
        s"""SELECT DISTINCT id, unnest(
           |    CASE WHEN len(w) < $shingleN THEN [array_to_string(w, ' ')]
           |         ELSE list_transform(range(0, len(w) - ${shingleN - 1}),
           |                i -> array_to_string(
           |                  list_slice(w, i + 1, i + $shingleN), ' ')) END
           |  ) AS term
           |  FROM (SELECT id, string_split(text, ' ') AS w
           |        FROM ($docsSql))""".stripMargin
    s"""WITH tok AS (
       |  $termsSql),
       |tdf AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |        FROM tok GROUP BY term),
       |ranked AS (
       |  SELECT tok.id, tok.term, tdf.df,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY tok.id
       |      ORDER BY tdf.df, tok.term) AS BIGINT) AS pos,
       |    CAST(COUNT(*) OVER (PARTITION BY tok.id) AS BIGINT) AS len
       |  FROM tok JOIN tdf ON tok.term = tdf.term),
       |prefix AS (
       |  SELECT term, id, len FROM ranked
       |  WHERE pos <= len - CEIL($threshold * len) + 1$capPred),
       |cand AS (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b,
       |    x.len AS l_a, y.len AS l_b
       |  FROM prefix x JOIN prefix y
       |    ON x.term = y.term AND x.id < y.id),
       |verified AS (
       |  SELECT c.id_a, c.id_b, c.l_a, c.l_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN tok ta ON ta.id = c.id_a
       |  JOIN tok tb ON tb.id = c.id_b AND tb.term = ta.term
       |  GROUP BY c.id_a, c.id_b, c.l_a, c.l_b)
       |SELECT id_a, id_b, inter, l_a, l_b,
       |  CAST(inter AS DOUBLE) / CAST(l_a + l_b - inter AS DOUBLE)
       |    AS jaccard
       |FROM verified
       |WHERE CAST(inter AS DOUBLE) / CAST(l_a + l_b - inter AS DOUBLE)
       |  >= $threshold""".stripMargin
  }
}
