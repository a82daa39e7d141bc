package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality metrics, stopword ratios, a deterministic
  * language-ID heuristic, and document fingerprinting. All pure `Column`
  * expressions (codegen'd, no UDFs) so they pipeline inside whole-stage
  * codegen over a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace tokenization — the coarse splitter used by the quality
    * metrics below.
    */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-style PRE-tokenization (the split GPT-class tokenizers apply
    * before merges): runs of letters, runs of digits, and runs of other
    * non-space characters are separate tokens, each optionally absorbing
    * one leading space. Deliberately restricted to constructs RE2 and the
    * JVM regex engine interpret identically (no lookaround, no \\p classes)
    * so the count is oracle-checkable cross-engine; a production tokenizer
    * would plug its vocabulary's merge table in downstream of this split.
    */
  val subwordPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  def subwordTokens(text: Column): Column =
    regexp_extract_all(text, lit(subwordPattern), lit(0))

  /** Pre-merge token count — the standard proxy for "how many BPE tokens
    * will this cost" when the merge vocabulary isn't on the cluster.
    */
  def subwordTokenCount(text: Column): Column =
    size(subwordTokens(text)).cast("long")

  /** Characters per token — a cheap fluency signal. Raw quotient, no
    * round(): the operands are integers on every engine, so the IEEE
    * division is bit-identical, while round() algorithms differ on exact
    * halves (which terminating quotients hit often).
    */
  def avgTokenLength(text: Column): Column =
    length(text).cast("double") / tokenCount(text)

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("long")

  /** Fraction of tokens that are stopwords — high values suggest natural
    * prose, near-zero suggests tables/code/boilerplate.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    stopwordCount(text, stopwords).cast("double") / tokenCount(text)

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") /
      length(text)

  /** Marker-token language-ID heuristic: count language-specific stopword
    * hits per candidate language and pick the argmax. Tie-break (fixed,
    * and what the chained `when` below actually implements): `es` needs a
    * STRICT majority over both others; `de` wins ties with `es` (but must
    * strictly beat `en`); `en` wins every tie it participates in; zero
    * hits everywhere is `und`. A real system would use character n-gram
    * profiles; the decision structure (N scores -> argmax) is identical.
    */
  val enMarkers = Seq("the", "a", "of", "and")
  val esMarkers = Seq("el", "la", "los", "las", "de")
  val deMarkers = Seq("der", "die", "das", "und")

  def languageId(text: Column): Column = {
    val en = stopwordCount(text, enMarkers)
    val es = stopwordCount(text, esMarkers)
    val de = stopwordCount(text, deMarkers)
    when(es > en && es > de, "es")
      .when(de > en && de >= es, "de")
      .when(en > 0, "en")
      .otherwise("und")
  }

  // --- PII redaction -----------------------------------------------------
  // Standard corpus-prep hygiene: scrub well-formed emails / IPv4s / SSNs /
  // phone numbers before training. Patterns are deliberately restricted to
  // the RE2∩JVM-identical subset (no lookaround, no \b, no \p classes) so
  // the redaction replays bit-exactly in an oracle engine. Order matters
  // and is fixed: email first (so digit-bearing addresses aren't partially
  // eaten by the number patterns), then IPv4, then SSN (3-2-4), then phone
  // (3-3-4) — the two dashed shapes cannot match inside each other's
  // replacements. This is pattern scrubbing, not NER: version strings that
  // look like IPv4s will be redacted; a production pass would layer a model
  // behind the same column contract.

  /** (name, regex, replacement) in application order. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("phone", "[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"))

  /** Replace every PII match with its type tag. Pure chained
    * `regexp_replace` — codegen'd, one pass per pattern, pipelines inside
    * the scan stage. NULL text stays NULL.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Count of matches for one PII pattern (pre-redaction). NULL for NULL
    * text — guarded because this repo runs with legacy `size(NULL) = -1`.
    */
  def piiCount(text: Column, pattern: String): Column =
    when(text.isNotNull,
      size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long"))

  // --- repetition signals (Gopher-style quality filters) -----------------
  // Rae et al. 2021 (arXiv:2112.11446, Table A1) filter documents by how
  // repetitious they are: fraction of duplicate tokens / duplicate word
  // n-grams / mass of the single most frequent token. All per-document
  // signals; the first two are single-pass Column expressions (no shuffle),
  // the top-token one is an explode + two aggregations.

  /** Fraction of tokens that are repeat occurrences:
    * (total - distinct) / total. 0 for all-unique, → 1 for degenerate
    * repetition. NULL for NULL text.
    */
  def dupTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    val total = size(toks)
    (total.cast("double") - size(array_distinct(toks))) / total
  }

  /** Consecutive word n-grams as an array column. NULL for documents with
    * fewer than n tokens (and NULL text).
    *
    * Shape matters: the obvious `transform(sequence(…), i => concat of n
    * element_at(toks, …))` re-evaluates the TOKENIZER expression at every
    * element_at site — O(n · grams) split() calls per row (measured 7× on
    * q_decontaminate at 5k docs). Instead: n shifted views of the token
    * array (each evaluating the tokenizer once per ROW), chained
    * elementwise with `zip_with` concat. Positions past a shorter shifted
    * view are NULL-padded by zip_with and NULL-propagated by concat, so
    * the final slice keeps exactly the size−n+1 complete grams. Gram
    * strings are identical to the per-position form (tokens joined by
    * single spaces).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = tokens(text)
    val shifted = (1 until n).map(j => slice(toks, lit(j + 1), size(toks)))
    val chained = shifted.foldLeft(toks)((acc, s) =>
      zip_with(acc, s, (a, b) => concat(a, lit(" "), b)))
    when(size(toks) >= n, slice(chained, lit(1), size(toks) - n + 1))
      .otherwise(lit(null))
  }

  /** Fraction of word n-grams that are repeat occurrences. NULL when the
    * document has fewer than n tokens (no gram exists) or NULL text. The
    * `when` guard keeps the `sequence` branch unevaluated for short
    * documents — `sequence(0, negative)` would throw under ANSI.
    */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val cnt = size(tokens(text)) - (n - 1)
    when(cnt > 0,
      (cnt.cast("double") - size(array_distinct(wordNgrams(text, n)))) / cnt)
      .otherwise(lit(null).cast("double"))
  }

  /** Scale-path duplicate-n-gram fraction: the native expression
    * ([[graft.functions.DupNgramFrac]]) — one per-row call, no interpreted
    * lambda per gram. Identical output to [[dupNgramFrac]] (cross-checked
    * in ExtSpec on real documents).
    */
  def dupNgramFracNative(text: Column, n: Int): Column =
    graft.functions.TextMetricsFunctions.dup_ngram_frac(text, n)

  /** Count of tokens containing at least one ASCII letter. The pattern
    * `[^\sA-Za-z]*[A-Za-z][^\s]*` absorbs a whole whitespace-delimited
    * token around its FIRST letter, so non-overlapping leftmost matching
    * counts exactly the letter-bearing tokens — a codegen'd regexp count,
    * not an interpreted per-token lambda (`filter(tokens, …)` would run
    * the lambda interpreted per token; this stays in whole-stage codegen).
    * The first atom excludes letters so a letter-free run FAILS FAST: the
    * naive `[^\s]*[A-Za-z]` prefix backtracks quadratically over long
    * digit/symbol tokens, this form fails each start position in O(1).
    * Match set is unchanged (each letter-bearing token still matches in
    * full from its first character). NULL for NULL text.
    */
  def alphaTokenCount(text: Column): Column =
    when(text.isNotNull,
      size(regexp_extract_all(text, lit("[^\\sA-Za-z]*[A-Za-z][^\\s]*"), lit(0)))
        .cast("long"))

  /** Fraction of tokens bearing at least one letter — Gopher's
    * "80% of words contain an alphabetic character" rule signal.
    */
  def alphaTokenFrac(text: Column): Column =
    alphaTokenCount(text).cast("double") / tokenCount(text)

  /** Symbol-to-token ratio: occurrences of `#` plus occurrences of `...`
    * per token (Gopher's symbol-ratio rule, threshold 0.1). Integer counts
    * divided raw — bit-identical cross-engine.
    */
  def symbolToTokenRatio(text: Column): Column = {
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = size(regexp_extract_all(text, lit("\\.\\.\\."), lit(0)))
    when(text.isNotNull,
      (hashes + ellipses).cast("double") / tokenCount(text))
  }

  /** Mass of the single most frequent token per document:
    * max(count) / total tokens. Table operator (explode + two shuffles on
    * the doc id) because a per-row mode over an array is quadratic, while
    * the relational form is the linear 100 TB shape. Documents whose text
    * is NULL explode to zero rows and are ABSENT — left-join from the
    * corpus to keep them.
    */
  def topTokenFrac(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), explode(tokens(col(text))).as("tok"))
      .groupBy(id, "tok").agg(count(lit(1)).as("c"))
      .groupBy(id)
      .agg((max(col("c")).cast("double") / sum(col("c"))).as("top_token_frac"))

  /** MOSS-style copy-detection candidate pairs: documents sharing at least
    * `minShared` winnowed fingerprints. The fingerprint table (native
    * expression, no shuffle) self-joins on the fingerprint key, so
    * candidates are fingerprint-bucket mates only. The winnowing
    * guarantee (any shared substring of length >= k + w - 1 implies at
    * least ONE shared fingerprint) makes this a guaranteed-recall
    * candidate set ONLY at `minShared = 1` and only among fingerprints
    * under the frequency cap; higher `minShared` deliberately trades that
    * recall floor for precision (a single shared fingerprint on a short
    * overlap is usually noise). A fingerprint shared by B docs yields B²
    * pairs, so `maxDocFreq` prunes ubiquitous boilerplate fingerprints
    * BEFORE pairing — the standard MOSS treatment: a fingerprint in
    * hundreds of documents identifies boilerplate, not copying, and on a
    * near-dup-heavy corpus the cap is the difference between a bounded
    * candidate set and a quadratic blowup. Like
    * [[graft.ext.Dedup.ngramJaccardPairs]], this remains the verify stage
    * after coarser dedup at scale.
    */
  def winnowCandidatePairs(
      df: DataFrame, id: String, text: String,
      k: Int = 8, w: Int = 4, minShared: Int = 2,
      maxDocFreq: Int = 20): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    // Pinned (r20): fps feeds the doc-frequency aggregate AND the kept
    // join, and kept feeds BOTH sides of the pair self-join — unpinned,
    // the per-row winnow pass re-ran per consumer (the executed plan
    // read 8 corpus scans, 0 reused exchanges; the multi-consumer rule).
    val fps = winnowFingerprintsNative(df, id, text, k, w)
      .localCheckpoint(true)
    val rare = fps.groupBy("fingerprint")
      .agg(count(lit(1)).as("_df"))
      .filter(col("_df") <= maxDocFreq)
      .select("fingerprint")
    val kept = fps.join(rare, Seq("fingerprint"))
      .select(col("fingerprint"), col(id))
      .localCheckpoint(true)
    val a = kept.toDF("fingerprint", "id1")
    val b = kept.toDF("fingerprint", "id2")
    a.join(b, Seq("fingerprint"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Token-window document chunking — the preprocessing step that turns
    * long documents into trainable pieces: chunks of `chunkTokens`
    * whitespace tokens, starts advancing by `stride` (stride < chunkTokens
    * gives overlap). Start positions run while the previous window hasn't
    * covered the tail, so every token lands in at least one chunk, no
    * chunk is empty, and only the last chunk may be shorter. A document
    * with fewer than `chunkTokens` tokens yields exactly one chunk (the
    * whole document); NULL text yields no rows.
    *
    * One per-row `transform` + `explode` (lambda per CHUNK, not per
    * token — the arrays move through bulk `slice`/`array_join`); NO
    * shuffle. Output: (id, chunk_id, chunk_text, chunk_tokens).
    */
  def chunkByTokens(
      df: DataFrame, id: String, text: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1 && stride >= 1,
      s"chunkTokens and stride must be positive, got $chunkTokens/$stride")
    // stride > chunkTokens would SKIP tokens between windows and emit
    // empty tail chunks — the documented invariants hold only for
    // overlapping-or-adjacent windows
    require(stride <= chunkTokens,
      s"stride ($stride) must be <= chunkTokens ($chunkTokens)")
    val toks = tokens(col(text))
    val n = size(toks)
    // ((max(n - chunk, 0) + stride - 1) / stride) + 1, exact in doubles
    // (token counts are far below 2^53)
    val nChunks = (floor((greatest(n - chunkTokens, lit(0)) + lit(stride - 1))
      / lit(stride)) + 1).cast("int")
    val chunks = transform(sequence(lit(0), nChunks - 1), ci => {
      val window = slice(toks, ci * stride + 1, lit(chunkTokens))
      struct(ci.cast("long").as("chunk_id"),
        array_join(window, " ").as("chunk_text"),
        size(window).cast("long").as("chunk_tokens"))
    })
    // Explicit NULL-text guard: size(NULL) is -1 under the legacy flag, so
    // the arithmetic alone would fabricate one garbage chunk for NULL
    // documents instead of dropping them.
    df.select(col(id),
      inline(when(col(text).isNotNull, chunks).otherwise(lit(null))))
  }

  /** CONTENT-DEFINED chunking (the CDC/Rabin idea at token granularity,
    * as used by storage dedup — LBFS, restic, borg — and by training-
    * corpus incremental pipelines): a chunk boundary falls AFTER every
    * token whose content hash is ≡ 0 mod `targetTokens`, so expected
    * chunk length is `targetTokens` and — the property fixed windows
    * ([[chunkByTokens]]) fundamentally lack — boundaries depend only on
    * LOCAL content: inserting or deleting a prefix re-chunks only the
    * chunks it touches, and every later chunk keeps its exact
    * fingerprint (spec-asserted). That makes cross-snapshot chunk-level
    * dedup of a drifting corpus an exact fingerprint join instead of a
    * full re-alignment.
    *
    * Pure content rule, no min/max clamps — clamps reintroduce the
    * position dependence CDC exists to remove (documented trade-off:
    * pathological token streams can produce very short/long chunks).
    *
    * Output: (id, chunk_id, chunk_text, chunk_tokens, chunk_fp) with
    * `chunk_fp` = md5(chunk_text) — the join key for chunk-level dedup.
    * Every hash is the engine-portable md5-31-bit idiom, so the whole
    * chunking replays in the DuckDB oracle.
    *
    * Plan: one token posexplode, one per-doc cumulative-sum window
    * (id-keyed exchange), one (id, chunk) regroup on the same key —
    * nothing pairwise, no driver state.
    */
  def cdcChunks(
      df: DataFrame, id: String, text: String,
      targetTokens: Int = 64): DataFrame = {
    require(targetTokens >= 2,
      s"targetTokens must be >= 2, got $targetTokens")
    val reserved = Seq("_pos", "_tok", "_brk", "chunk_id", "chunk_text",
      "chunk_tokens", "chunk_fp")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain reserved column $c"))
    val toks = df.where(col(text).isNotNull)
      .select(col(id),
        posexplode(tokens(col(text))).as(Seq("_pos", "_tok")))
      .where(col("_tok") =!= "")
    val h = conv(substring(md5(col("_tok")), 1, 8), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(id)).orderBy(col("_pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    toks
      .withColumn("_brk",
        when(h % lit(targetTokens.toLong) === 0, 1L).otherwise(0L))
      // chunk id = boundaries STRICTLY BEFORE this token (boundary token
      // closes its own chunk)
      .withColumn("chunk_id", coalesce(sum(col("_brk")).over(w), lit(0L)))
      .groupBy(col(id), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_pos"), col("_tok")))),
          s => s("_tok")), " ").as("chunk_text"),
        count(lit(1)).as("chunk_tokens"))
      .withColumn("chunk_fp", md5(col("chunk_text")))
  }

  /** Blocklist screen — the C4 / UT1-blocklist gate every published web
    * corpus applies: count banned-term occurrences (case-insensitive,
    * whole-word) and flag documents to keep. `maxBannedPerMille = 0`
    * (default) is C4's rule — ANY banned word drops the page; a positive
    * value keeps documents whose banned-token rate stays at or under
    * `maxBannedPerMille`/1000 of their tokens (the ratio form larger
    * corpora use so one quoted slur doesn't delete an encyclopedia).
    *
    * The blocklist compiles into ONE alternation regex evaluated by a
    * codegen'd `regexp_count` — zero joins, zero shuffles, linear scan;
    * terms are restricted to `[A-Za-z0-9_-]` so the pattern needs no
    * escaping and RE2 (oracle) and the JVM engine (Spark) read it
    * identically (the [[subwordPattern]] portability rule; `\b` with both
    * anchors makes alternation-order and leftmost-longest differences
    * unobservable — only whole tokens can match).
    *
    * Output: input + `banned_count` + `keep`. NULL text ⇒ NULL
    * annotations (no content to screen — route, don't silently keep).
    */
  /** Whole-word banned-term occurrence count — [[blocklistScreen]]'s
    * scoring column as a standalone expression (one codegen'd regex,
    * zero shuffles; also the SQL macro `graft_banned_count`). NULL text
    * counts NULL. Terms are restricted to [A-Za-z0-9_-]+ so the regex
    * is engine-safe with no escaping.
    */
  def bannedCount(text: Column, blocklist: Seq[String]): Column = {
    require(blocklist.nonEmpty, "blocklist must not be empty")
    val bad = blocklist.find(!_.matches("[A-Za-z0-9_-]+"))
    require(bad.isEmpty,
      s"blocklist terms must match [A-Za-z0-9_-]+ (regex- and engine-safe): ${bad.get}")
    val pattern = "\\b(" + blocklist.map(_.toLowerCase).distinct.mkString("|") + ")\\b"
    when(text.isNull, lit(null).cast("long"))
      .otherwise(regexp_count(lower(text), lit(pattern)).cast("long"))
  }

  def blocklistScreen(
      df: DataFrame, text: String, blocklist: Seq[String],
      maxBannedPerMille: Long = 0): DataFrame = {
    require(maxBannedPerMille >= 0 && maxBannedPerMille <= 1000,
      s"maxBannedPerMille must be in [0, 1000], got $maxBannedPerMille")
    // term validation lives in bannedCount — one definition, no drift
    val reserved = Seq("banned_count", "keep")
    reserved.foreach(c => require(!df.columns.contains(c),
      s"input must not already contain reserved column $c"))
    df.withColumn("banned_count", bannedCount(col(text), blocklist))
      .withColumn("keep",
        when(col(text).isNull, lit(null).cast("boolean"))
          .otherwise(
            col("banned_count") * 1000 <= lit(maxBannedPerMille) * tokenCount(col(text))))
  }

  /** Content fingerprint: md5 of the case/whitespace-normalized text.
    * Stable across engines (md5 is bit-exact everywhere), usable as an
    * exact-dedup key at any scale.
    */
  def fingerprint(text: Column): Column = md5(lower(trim(text)))

  /** Rolling-hash LOCAL fingerprints by winnowing (Schleimer, Wilkerson,
    * Aiken, SIGMOD 2003 — the MOSS algorithm): hash every character
    * `k`-gram, slide a window of `w` consecutive gram hashes, keep each
    * window's minimum. Guarantee: two documents sharing any substring of
    * length >= w + k - 1 share at least one fingerprint — the
    * partial-overlap detector md5-of-the-whole-document cannot be.
    *
    * Plan shape: positions explode once (one row per k-gram), the gram
    * hash is a codegen'd substr+xxhash64, and the window minimum rides ONE
    * per-document sort — the same exchange profile as the other
    * per-document operators. Output: (id, fingerprint) distinct pairs.
    * Documents shorter than `k + w - 1` characters have no full window and
    * yield NO rows (they are below the guarantee's match length; pair with
    * [[fingerprint]] for whole-document identity on short texts).
    */
  /** Scale-path winnowing: the native expression
    * ([[graft.functions.WinnowFingerprints]]) computes each document's
    * entire fingerprint set in ONE per-row pass (gram hashes, O(n)
    * monotone-deque sliding minimum, dedup) — no gram explode, no
    * per-document sort, NO shuffle, and the expression stays inside
    * whole-stage codegen. Emits the same (id, fingerprint) set as
    * [[winnowFingerprints]] (cross-checked in ExtSpec); documents shorter
    * than `k + w - 1` characters yield no rows in both forms.
    */
  def winnowFingerprintsNative(
      df: DataFrame, id: String, text: String,
      k: Int = 8, w: Int = 4): DataFrame =
    df.select(col(id),
      explode(graft.functions.WinnowFunctions.winnow_fingerprints(col(text), k, w))
        .as("fingerprint"))

  def winnowFingerprints(
      df: DataFrame, id: String, text: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"k and w must be positive, got k=$k w=$w")
    val grams = df
      .filter(length(col(text)) >= k + w - 1)
      .select(col(id),
        explode(sequence(lit(0), length(col(text)) - k)).as("pos"),
        (length(col(text)) - k - (w - 1)).as("_last_start"),
        col(text))
      .select(col(id), col("pos"), col("_last_start"),
        xxhash64(col(text).substr(col("pos") + 1, lit(k))).as("h"))
    val win = Window.partitionBy(id).orderBy("pos").rowsBetween(0, w - 1)
    grams
      .select(col(id), col("pos"), col("_last_start"),
        min(col("h")).over(win).as("fingerprint"))
      // only FULL windows select (the classic algorithm); trailing partial
      // windows would add spurious suffix minima
      .filter(col("pos") <= col("_last_start"))
      .select(col(id), col("fingerprint"))
      .distinct()
  }
}
