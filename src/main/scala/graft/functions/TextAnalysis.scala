package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure Column
  * expressions (codegen-friendly, no UDFs), each with a deterministic SQL
  * mirror so results are DuckDB-checkable.
  *
  * The language-ID stopword lists are the single source of truth for both
  * the Spark expressions and the generated oracle SQL ([[langIdSql]]).
  */
object TextAnalysis {

  /** Whitespace tokenization — corpus text is single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: ~4 chars per subword token (public rule of
    * thumb for byte-pair encoders).
    */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** Punctuation ratio via translate (identical semantics in DuckDB —
    * avoids regex-flag differences between engines).
    */
  val PunctChars = ".,!?;:'\""
  def punctRatio(text: Column): Column =
    (length(text) - length(translate(text, PunctChars, ""))).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Character-class inventory for the script profile — `translate`
    * alphabets, not regexes (regex char-class semantics differ subtly
    * between Java and RE2; translate is char-for-char identical).
    */
  val AsciiAlpha: String =
    ('a' to 'z').mkString + ('A' to 'Z').mkString
  val AsciiDigit: String = ('0' to '9').mkString
  val AsciiPunct: String = "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"

  private def classCount(text: Column, chars: String): Column =
    (length(text) - length(translate(text, chars, ""))).cast("long")

  /** Per-document character-class/script profile: how much of the text
    * is ASCII letters, digits, spaces, punctuation, or OTHER (the
    * other bucket is where non-Latin scripts, control bytes, and
    * mojibake land) — the script-detection quality signal that flags
    * encoding damage and wrong-script slices before tokenization.
    * Pure scan-local length arithmetic; no shuffle.
    */
  def charClassProfile(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_alpha", classCount(t, AsciiAlpha))
      .withColumn("n_digit", classCount(t, AsciiDigit))
      .withColumn("n_space", classCount(t, " "))
      .withColumn("n_punct", classCount(t, AsciiPunct))
      .withColumn("n_other",
        col("n_chars") - col("n_alpha") - col("n_digit") -
          col("n_space") - col("n_punct"))
  }

  /** Corpus script profile rolled up per stratum (language, source…):
    * doc counts plus summed char-class counts and the non-ASCII
    * fraction. One partial-aggregating groupBy over the scan.
    */
  def scriptProfile(df: DataFrame, stratumCol: String,
      textCol: String): DataFrame =
    charClassProfile(df, textCol)
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("n_chars"),
        sum("n_alpha").as("n_alpha"), sum("n_digit").as("n_digit"),
        sum("n_space").as("n_space"), sum("n_punct").as("n_punct"),
        sum("n_other").as("n_other"))
      .withColumn("other_frac", col("n_other").cast("double") /
        greatest(col("n_chars"), lit(1L)).cast("double"))

  /** SQL string literal with embedded quotes doubled. */
  def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB mirror of [[charClassProfile]]'s count of `chars` in
    * text expression `e`.
    */
  def classCountSql(e: String, chars: String): String =
    s"CAST(length($e) - length(translate($e, ${sqlQuote(chars)}, '')) AS BIGINT)"

  /** Language → marker stopwords. Public high-frequency function words. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"))

  val AllStopwords: Seq[String] = StopwordLists.flatMap(_._2).distinct

  /** Count of tokens (with multiplicity) that are stopwords of any list. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t =>
      AllStopwords.map(w => t === w).reduce(_ || _)))

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Per-language score: number of that language's marker words present
    * (presence, not multiplicity — one CASE per word, mirrored 1:1 in
    * [[langIdSql]]).
    */
  private def langScore(text: Column, words: Seq[String]): Column = {
    val toks = tokens(text)
    words.map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Heuristic language ID: argmax of marker-word scores, ties broken in
    * [[StopwordLists]] order, all-zero ⇒ "unknown".
    */
  def langId(text: Column): Column = {
    val scores = StopwordLists.map { case (lang, ws) => lang -> langScore(text, ws) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((lang, s), els) =>
      when(s === best && s > 0, lang).otherwise(els)
    }
  }

  /** SQL mirror of [[langId]] + [[stopwordRatio]] building blocks,
    * generated from the same lists. `toks` must be a VARCHAR[] column in
    * scope.
    */
  def langScoreSql(toksExpr: String, words: Seq[String]): String =
    words.map(w => s"CASE WHEN list_contains($toksExpr, '$w') THEN 1 ELSE 0 END")
      .mkString(" + ")

  def langIdSql(toksExpr: String): String = {
    val scoreExprs = StopwordLists.map { case (lang, ws) =>
      lang -> s"(${langScoreSql(toksExpr, ws)})"
    }
    val best = scoreExprs.map(_._2).reduceRight((a, b) => s"GREATEST($a, $b)")
    val cases = scoreExprs.reverse.foldLeft("'unknown'") { case (els, (lang, s)) =>
      s"CASE WHEN $s = $best AND $s > 0 THEN '$lang' ELSE $els END"
    }
    cases
  }

  def stopwordCountSql(toksExpr: String): String = {
    val lst = AllStopwords.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, x -> list_contains([$lst], x)))"
  }

  /** Composite quality score in [0,1]: length component + stopword
    * component, deterministic double arithmetic.
    */
  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / lit(100.0), lit(1.0)) * lit(0.5) +
      stopwordRatio(text) * lit(0.5)

  /** DuckDB mirror of [[qualityScore]] over a VARCHAR[] tokens
    * expression — single source of truth for every oracle that scores
    * quality (text_stats, curation, weighted sampling).
    */
  def qualityScoreSql(toksExpr: String): String =
    s"""(LEAST(CAST(len($toksExpr) AS DOUBLE) / 100.0, 1.0) * 0.5 +
       |  (CAST(${stopwordCountSql(toksExpr)} AS DOUBLE)
       |   / CAST(GREATEST(len($toksExpr), 1) AS DOUBLE)) * 0.5)""".stripMargin

  /** Content fingerprint: md5 of the lower-cased trimmed text (md5 hex is
    * identical across engines). A rolling-hash variant lives in
    * [[graft.functions.RollingHash]] as a native Catalyst expression.
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  // --- PII redaction ----------------------------------------------------
  //
  // Standard curation scrubbing: emails, dotted-quad IPs, US-style phone
  // numbers → typed placeholder tags. Patterns are deliberately restricted
  // to syntax Java regex and RE2 (DuckDB) interpret identically — no
  // lookaround, no backrefs, no \b (RE2 and Java agree on \b, but word
  // boundaries around punctuation-adjacent PII differ subtly; explicit
  // delimiter classes are deterministic in both). Pure regexp_replace
  // expressions: per-row map work that rides the scan at any scale.

  /** Each (pattern, replacement); applied in order. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** Redact all [[PiiPatterns]] from `text`, in order. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Count of PII matches found (pre-redaction), for audit columns. */
  def piiCount(text: Column): Column =
    PiiPatterns.map { case (pat, _) =>
      (size(split(text, pat, -1)) - 1).cast("long")
    }.reduce(_ + _)

  /** DuckDB mirrors, generated from [[PiiPatterns]] so both engines share
    * one pattern list. `e` is a VARCHAR expression.
    */
  def redactPiiSql(e: String): String =
    PiiPatterns.foldLeft(e) { case (s, (pat, rep)) =>
      // DuckDB '...' literals are raw (no backslash processing): the
      // Java-regex pattern string passes through verbatim to RE2
      val p = pat.replace("'", "''")
      s"regexp_replace($s, '$p', '$rep', 'g')"
    }

  def piiCountSql(e: String): String =
    PiiPatterns.map { case (pat, _) =>
      val p = pat.replace("'", "''")
      s"CAST(len(regexp_split_to_array($e, '$p')) - 1 AS BIGINT)"
    }.mkString("(", " + ", ")")

  // --- Repetition metrics (Gopher-style quality filters) ---------------
  //
  // Within-document repetition signals used by public corpus-curation
  // recipes (duplicate n-gram fraction, most-common-word share). All are
  // per-row array expressions: zero shuffle, the whole profile rides the
  // parquet scan inside one WholeStageCodegen span — at 100 TB this is
  // embarrassingly parallel map work.

  /** Non-distinct word n-grams (multiplicity preserved — unlike
    * [[graft.functions.Dedup.wordShingles]], which dedups for set
    * Jaccard). Shorter-than-n docs yield an empty list.
    */
  def tokenNgrams(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram size must be >= 1")
    val w = tokens(text)
    // the >= n branch is the native WordShinglesExpr (identical output
    // there — one tight loop vs interpreted transform/slice lambdas);
    // the < n guard preserves this helper's empty-array convention
    // where wordShingles would emit its whole-text shingle
    when(size(w) < n, array().cast("array<string>"))
      .otherwise(Sketches.wordShingles(w, n))
  }

  /** Fraction of array elements that are repeats of an earlier element:
    * (len - distinct len) / len, 0 for empty.
    */
  def dupFrac(arr: Column): Column = {
    val a = arr
    when(size(a) === 0, lit(0.0)).otherwise(
      (size(a) - size(array_distinct(a))).cast("double") /
        size(a).cast("double"))
  }

  /** Share of tokens taken by the single most frequent token, measured
    * over the first `MaxRepetitionTokens` tokens — the mode's
    * multiplicity via the native [[Sketches.modeCount]] kernel (one
    * hash-map pass per row, O(n)). History of this expression: the
    * original distinct×filter formulation was O(n²) interpreted (77 s on
    * one adversarial document); the sorted-run fold that replaced it was
    * O(n log n) but still an interpreted struct-accumulator lambda —
    * ~2 ms/document, the whole text_repetition budget once the bench's
    * noop forcing stopped count() from pruning the column. Same value
    * as both (null tokens group together, matching the old null-safe
    * fold). Still an array expression rather than explode+groupBy so
    * the corpus never shuffles; the cap bounds BOTH memory and time.
    */
  val MaxRepetitionTokens = 10000

  def topTokenFrac(text: Column): Column = {
    val w = slice(tokens(text), 1, MaxRepetitionTokens)
    when(size(w) === 0, lit(0.0))
      .otherwise(Sketches.modeCount(w).cast("double") /
        size(w).cast("double"))
  }

  /** DuckDB mirrors of the repetition metrics, generated so both engines
    * share one definition. `w` must be a VARCHAR[] expression.
    */
  def tokenNgramsSql(w: String, n: Int): String =
    s"""CASE WHEN len($w) < $n THEN CAST([] AS VARCHAR[])
       |     ELSE list_transform(range(0, len($w) - ${n - 1}),
       |            i -> array_to_string(list_slice($w, i + 1, i + $n), ' ')) END""".stripMargin

  def dupFracSql(a: String): String =
    s"""CASE WHEN len($a) = 0 THEN 0.0
       |     ELSE CAST(len($a) - len(list_distinct($a)) AS DOUBLE)
       |          / CAST(len($a) AS DOUBLE) END""".stripMargin

  /** DuckDB mirror of [[topTokenFrac]]: the mode's count via a list
    * histogram (O(n)) — different syntax, same exact integer count, so
    * the final double is bit-identical to the Spark side.
    */
  def topTokenFracSql(w0: String): String = {
    val w = s"list_slice($w0, 1, $MaxRepetitionTokens)"
    s"""CASE WHEN len($w) = 0 THEN 0.0
       |     ELSE CAST(list_max(map_values(list_aggregate($w, 'histogram'))) AS DOUBLE)
       |          / CAST(len($w) AS DOUBLE) END""".stripMargin
  }

  // --- Gopher-style quality rule gates ----------------------------------
  //
  // The per-document keep/drop rule battery of public corpus-curation
  // recipes (Rae et al. 2021 "Scaling Language Models: ... Gopher",
  // appendix A1.1): word-count bounds, mean-word-length bounds,
  // symbol-to-word ratio, alphabetic-word fraction, stopword presence.
  // Every rule is a pure Column over integer-derived arithmetic — both
  // engines compute bit-identical doubles, so the whole report (metrics,
  // per-rule verdicts, final keep) is oracle-checkable. Zero shuffle: the
  // battery rides the parquet scan as map work at any corpus size.

  /** Rule thresholds. Defaults are the published Gopher values. */
  final case class QualityRules(
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordFrac: Double = 0.8,
      minStopwords: Int = 2)

  /** Mean word length. Text is single-space separated, so the word-length
    * sum is `length(text) - (n_words - 1)`; the identical formula runs in
    * the oracle, so the metric is engine-independent even if a source
    * ever violated that convention.
    */
  def meanWordLen(text: Column): Column =
    (length(text) - (tokenCount(text) - 1)).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Symbol characters counted by the symbol-to-word ratio rule (the
    * Gopher rule counts hash and ellipsis).
    */
  val SymbolChars = "#…"

  def symbolToWordRatio(text: Column): Column =
    (length(text) - length(translate(text, SymbolChars, ""))).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Fraction of words containing at least one ASCII letter. */
  def alphaWordFrac(text: Column): Column =
    size(filter(tokens(text), t => t.rlike("[A-Za-z]"))).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** The full rule battery: metric columns, one boolean per rule, and the
    * conjunction `keep`. Append to a select over the corpus scan.
    */
  def qualityRuleColumns(text: Column,
      cfg: QualityRules = QualityRules()): Seq[Column] = {
    val nWords = tokenCount(text).cast("long")
    val mwl = meanWordLen(text)
    val sym = symbolToWordRatio(text)
    val alpha = alphaWordFrac(text)
    val stops = stopwordCount(text).cast("long")
    val rWords = nWords >= cfg.minWords && nWords <= cfg.maxWords
    val rMwl = mwl >= cfg.minMeanWordLen && mwl <= cfg.maxMeanWordLen
    val rSym = sym <= cfg.maxSymbolRatio
    val rAlpha = alpha >= cfg.minAlphaWordFrac
    val rStops = stops >= cfg.minStopwords
    Seq(
      nWords.as("n_words"), mwl.as("mean_word_len"),
      sym.as("symbol_ratio"), alpha.as("alpha_frac"),
      stops.as("n_stopwords"),
      rWords.as("rule_word_count"), rMwl.as("rule_mean_word_len"),
      rSym.as("rule_symbol_ratio"), rAlpha.as("rule_alpha_words"),
      rStops.as("rule_stopwords"),
      (rWords && rMwl && rSym && rAlpha && rStops).as("keep"))
  }

  /** DuckDB mirror of [[qualityRuleColumns]] — the same select-list
    * fragment generated from the same config. `toksExpr` must be a
    * VARCHAR[] expression over a `text` column in scope.
    */
  def qualityRuleColumnsSql(toksExpr: String,
      cfg: QualityRules = QualityRules()): String = {
    val n = s"len($toksExpr)"
    val gD = s"CAST(GREATEST($n, 1) AS DOUBLE)"
    val mwl = s"(CAST(length(text) - ($n - 1) AS DOUBLE) / $gD)"
    val sym = s"(CAST(length(text) - length(translate(text, '$SymbolChars', '')) AS DOUBLE) / $gD)"
    val alpha = s"(CAST(len(list_filter($toksExpr, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / $gD)"
    val stops = s"CAST(${stopwordCountSql(toksExpr)} AS BIGINT)"
    val rWords = s"($n >= ${cfg.minWords} AND $n <= ${cfg.maxWords})"
    val rMwl = s"($mwl >= ${cfg.minMeanWordLen} AND $mwl <= ${cfg.maxMeanWordLen})"
    val rSym = s"($sym <= ${cfg.maxSymbolRatio})"
    val rAlpha = s"($alpha >= ${cfg.minAlphaWordFrac})"
    val rStops = s"($stops >= ${cfg.minStopwords})"
    s"""CAST($n AS BIGINT) AS n_words,
       |  $mwl AS mean_word_len,
       |  $sym AS symbol_ratio,
       |  $alpha AS alpha_frac,
       |  $stops AS n_stopwords,
       |  $rWords AS rule_word_count,
       |  $rMwl AS rule_mean_word_len,
       |  $rSym AS rule_symbol_ratio,
       |  $rAlpha AS rule_alpha_words,
       |  $rStops AS rule_stopwords,
       |  ($rWords AND $rMwl AND $rSym AND $rAlpha AND $rStops) AS keep""".stripMargin
  }

  // --- Feature-hashed linear classifier ---------------------------------
  //
  // The fastText-shaped quality/domain classifier of a curation pipeline:
  // each token hashes into one of `ClassifierDim` feature buckets (the
  // hashing trick — no vocabulary table at all), and the document score is
  // the sum of the buckets' weights. Weights here are derived
  // deterministically from the bucket index via the same 60-bit md5 both
  // engines share — a stand-in for trained weights with identical plumbing
  // (swap `bucketWeight` for a lookup into a broadcast weights array to
  // serve a real model). Everything is a scalar expression in the scan's
  // project: zero shuffles, zero joins, linear in tokens — the ideal
  // 100 TB shape for a per-document classifier.

  /** Number of hashed feature buckets (power of two, fastText-style). */
  val ClassifierDim = 1024

  /** Feature bucket of one token: md5-60bit(token) mod ClassifierDim. */
  def featureBucket(tok: Column): Column =
    pmod(Sampling.keyHash60(tok), lit(ClassifierDim))

  /** Deterministic weight of a bucket in [-1000, 1000]. */
  def bucketWeight(bucket: Column): Column =
    pmod(Sampling.keyHash60(concat(lit("w:"), bucket.cast("string"))),
      lit(2001)) - lit(1000)

  /** Per-document integer classifier score: Σ weight(bucket(token)). */
  def hashedClassifierScore(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + bucketWeight(featureBucket(t)).cast("long"))

  /** DuckDB mirror of [[hashedClassifierScore]] over token-list `w`. */
  def hashedClassifierScoreSql(w: String): String = {
    val bucket = s"(${Sampling.keyHash60Sql("t")} % $ClassifierDim)"
    val weight =
      s"((${Sampling.keyHash60Sql(s"'w:' || CAST($bucket AS VARCHAR)")} % 2001) - 1000)"
    s"CAST(COALESCE(list_sum(list_transform($w, t -> $weight)), 0) AS BIGINT)"
  }
}
