package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked-retrieval relevance scoring over the document corpus: document
  * frequency, per-document TF-IDF term profiles, and BM25 query scoring —
  * the primitives behind query-targeted corpus curation (pull the
  * documents most relevant to a seed query set, score domain relevance,
  * build retrieval training pairs).
  *
  * Scale shape: everything reduces to (id, term) postings produced by one
  * explode pass, then groupBy/join on the TERM key — never a pairwise
  * stage. Corpus-wide statistics (document count, average length) are
  * 1-row scalar aggregates broadcast back with the same crossJoin pattern
  * as [[CorpusSampling.percentileFilter]]. BM25 filters postings to the
  * query's terms BEFORE the first aggregation, so the per-query cost is
  * proportional to the postings of the query terms, not the corpus
  * vocabulary.
  *
  * Determinism policy (SURVEY.md §5.2.2): scores are surfaced as
  * `round(score, 4)` doubles AND ranked through an integer micro-score
  * (`cast(round(score * 1e6) as bigint)`) with a term/id tie-break, so
  * rank boundaries cannot flip on last-ulp `ln` differences between
  * engines replaying the oracle.
  */
object Relevance {

  /** Ceiling on the distinct-value count any bounded-histogram operator
    * ([[perplexityBuckets]], [[QualityClassifier.topPGate]]) will feed
    * through its single-partition cumulative window. Quantized score
    * domains ([0, 10^6] sigmoid scores, 10^4-scaled KN log-scores) stay
    * well under this; a raw-double score column — corpus-cardinality —
    * blows past it and fails fast instead of sorting the corpus on one
    * task.
    */
  val MaxHistogramValues: Long = 1L << 22

  /** Bounded-histogram operators only accept integer score columns:
    * float scores have corpus-cardinality value domains, which turns the
    * value-bounded histogram window into a full single-partition sort.
    */
  private[graft] def requireBoundedIntegerScore(
      df: DataFrame, scoreCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(scoreCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op requires an integer-typed score column (bounded value domain); " +
        s"$scoreCol is $dt — quantize first (e.g. round(score * 1e6).cast(\"long\"))")
  }

  /** Non-empty whitespace tokens as (id, term) postings — one row per
    * token OCCURRENCE (duplicates preserved; aggregate them per use
    * site). NULL text yields no postings.
    */
  def termPostings(df: DataFrame, id: String, text: String): DataFrame =
    df.where(col(text).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("term"))
      .where(col("term") =!= "")

  /** Document frequency per term: in how many distinct documents does the
    * term occur. ONE shuffle on the term key with map-side partial
    * distinct — the vocabulary table every IDF consumer shares.
    */
  def documentFrequency(df: DataFrame, id: String, text: String): DataFrame =
    termPostings(df, id, text)
      .groupBy("term")
      .agg(countDistinct(col(id)).as("doc_freq"))

  /** Integer micro-score used for ranking: exact BIGINT comparison in
    * every engine, immune to sub-1e-6 float divergence.
    */
  private[graft] def microScore(score: Column): Column =
    round(score * 1e6, 0).cast("long")

  /** Top-`k` TF-IDF terms per document: `tf * ln(N / df)` over whitespace
    * terms, where N counts documents WITH text. Emits
    * `(id, term, tf, doc_freq, score)` for the k highest-scoring terms of
    * each document (ties broken by term ascending).
    *
    * Plan: postings aggregate to (id, term, tf) [shuffle 1, on (id,
    * term)]; the df table [shuffle 2, on term] joins back on term —
    * BROADCAST by default since a word-type vocabulary grows ~O(corpus^β)
    * (Heaps' law) and stays executor-memory-sized long after the corpus
    * does not; pass broadcastVocab = false at extreme vocabulary (e.g.
    * hash-token) scales and AQE plans the join from runtime sizes. The
    * final per-document top-k is one row_number window on the id key
    * with rank-limit pushdown.
    */
  def tfidfTopTerms(
      df: DataFrame, id: String, text: String, k: Int,
      broadcastVocab: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val reserved = Seq("term", "tf", "doc_freq", "score", "_n_docs", "_rk")
    require(!reserved.exists(df.columns.contains),
      s"tfidfTopTerms reserves columns ${reserved.mkString(", ")}")
    val nDocs = df.where(col(text).isNotNull)
      .agg(count(lit(1)).as("_n_docs"))
    val tf = termPostings(df, id, text)
      .groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val vocab = documentFrequency(df, id, text)
    val hinted = if (broadcastVocab) broadcast(vocab) else vocab
    val scored = tf.join(hinted, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") *
          log(col("_n_docs").cast("double") / col("doc_freq").cast("double")))
    val w = Window.partitionBy(col(id))
      .orderBy(microScore(col("score")).desc, col("term"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .select(col(id), col("term"), col("tf"), col("doc_freq"),
        round(col("score"), 4).as("score"))
  }

  /** BM25 scores of every matching document against one bag-of-terms
    * query (Robertson/Spärck Jones, the Okapi formulation used by Lucene
    * and every search engine since):
    *
    *   score(d, q) = Σ_{t ∈ q} idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *   idf(t)      = ln(1 + (N − df + 0.5) / (df + 0.5))
    *
    * Documents sharing no term with the query are absent (score 0 by
    * definition). Duplicate query terms count once — a bag query is a
    * SET of terms here, matching Lucene's practice.
    *
    * Plan: postings filter to the query's terms FIRST (the isin predicate
    * pushes to the scan side of the explode), so everything downstream is
    * sized by the query-term postings. df comes from the same filtered
    * postings (df of non-query terms is never computed). Corpus-level N
    * and avgdl are 1-row broadcast scalars; the per-term idf join
    * broadcasts ≤ |query| rows; the final per-document sum is ONE shuffle
    * on the id key.
    */
  def bm25(
      df: DataFrame, id: String, text: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must not be empty")
    require(k1 >= 0, s"k1 must be >= 0, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")
    val reserved = Seq("term", "tf", "doc_freq", "score", "_n_docs",
      "_avgdl", "_dl", "_idf")
    require(!reserved.exists(df.columns.contains),
      s"bm25 reserves columns ${reserved.mkString(", ")}")
    val terms = queryTerms.distinct
    val postings = termPostings(df, id, text)
    // corpus stats: one pass over the postings' per-doc lengths — N and
    // avgdl must count every document with at least the empty token
    // stream, so they come from the SOURCE df, not the filtered postings
    val dl = df.where(col(text).isNotNull)
      .select(col(id),
        size(filter(TextAnalysis.tokens(col(text)), t => t =!= ""))
          .cast("long").as("_dl"))
    val stats = dl.agg(count(lit(1)).as("_n_docs"),
      avg(col("_dl").cast("double")).as("_avgdl"))
    val qPostings = postings.where(col("term").isin(terms: _*))
    val tf = qPostings.groupBy(col(id), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfT = qPostings.groupBy("term")
      .agg(countDistinct(col(id)).as("doc_freq"))
    val idf = dfT.crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n_docs") - col("doc_freq") + lit(0.5)) /
          (col("doc_freq") + lit(0.5))))
      .select("term", "_idf")
    val perTerm = tf.join(broadcast(idf), Seq("term"))
      .join(dl, Seq(id))
      .crossJoin(broadcast(stats.select("_avgdl")))
      .withColumn("score",
        col("_idf") * (col("tf") * (lit(k1) + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("_dl") / col("_avgdl"))))
    perTerm.groupBy(col(id))
      .agg(sum(col("score")).as("score"), count(lit(1)).as("n_terms"))
      .select(col(id), round(col("score"), 4).as("score"),
        col("n_terms"))
  }

  /** Corpus-trained bigram language-model quality score — the classic
    * LM-perplexity curation signal (CCNet / Wenzek et al. 2020 filter
    * corpora by KenLM perplexity; this is the same shape with the LM
    * trained relationally ON the corpus itself): each document scores the
    * mean add-alpha-smoothed bigram conditional log-probability
    *
    *   lm_score(d) = mean over bigrams (w1 w2) of
    *                 ln( (B(w1 w2) + α) / (U(w1) + α·V) )
    *
    * where B/U are corpus bigram/unigram occurrence counts and V the
    * vocabulary size. Fluent, typical text scores high; rare-junk token
    * sequences score low. Documents with no bigram (≤ 1 token or NULL
    * text) are absent — a one-token document has no sequence model to
    * judge.
    *
    * Plan: the LM "training" IS the scoring plan — bigram counts [one
    * shuffle on the gram key] join the doc-gram postings reusing that
    * same partitioning; the unigram table is vocabulary-sized and
    * broadcast (Heaps' law — pass broadcastVocab = false to let AQE
    * decide); V is a 1-row broadcast scalar; the per-document mean is one
    * shuffle on the id key. Nothing is driver-side, nothing is pairwise.
    */
  def bigramLmScore(
      df: DataFrame, id: String, text: String, alpha: Double = 0.5,
      broadcastVocab: Boolean = true): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val reserved = Seq("_gram", "_w1", "_n_w", "_n_b", "_v", "_lp",
      "n_bigrams", "lm_score")
    require(!reserved.exists(df.columns.contains),
      s"bigramLmScore reserves columns ${reserved.mkString(", ")}")
    val uni = termPostings(df, id, text)
      .groupBy(col("term").as("_w1")).agg(count(lit(1)).as("_n_w"))
    val vocab = uni.agg(count(lit(1)).as("_v"))
    val grams = df.where(col(text).isNotNull)
      .select(col(id),
        explode(TextAnalysis.wordNgrams(col(text), 2)).as("_gram"))
      .withColumn("_w1", split(col("_gram"), " ").getItem(0))
    // bigram count as a whole-partition window, NOT aggregate+self-join:
    // the join form exchanges the full gram table TWICE (once into the
    // groupBy, once into the join probe side); the window form exchanges
    // it once and counts in place
    val withBi = grams.withColumn("_n_b",
      count(lit(1)).over(Window.partitionBy(col("_gram"))))
    val uniH = if (broadcastVocab) broadcast(uni) else uni
    withBi
      .join(uniH, Seq("_w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("_lp",
        log((col("_n_b") + lit(alpha)) /
          (col("_n_w") + lit(alpha) * col("_v"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("_lp")), 4).as("lm_score"))
  }

  /** Corpus-trained INTERPOLATED KNESER–NEY bigram LM score — the
    * CCNet-style perplexity filter [[bigramLmScore]] approximates with
    * add-alpha smoothing, upgraded to the smoothing n-gram LMs actually
    * ship with (Kneser & Ney 1995; KenLM's default). Each document
    * scores the mean log of
    *
    *   P_KN(w2|w1) = (c(w1 w2) − D) / c(w1 ·)
    *               + D · N1+(w1 ·) / c(w1 ·) · N1+(· w2) / N1+(· ·)
    *
    * with absolute discount `D ∈ (0, 1)` (0.75, the textbook setting):
    * the discounted bigram maximum-likelihood term, interpolated with
    * the CONTINUATION probability — how many distinct contexts `w2`
    * completes, not how often it occurs. This is what separates KN from
    * add-alpha: a word that appears many times in ONE fixed phrase
    * ("Francisco") gets a low continuation weight even though its raw
    * unigram count is large. Because the LM trains on the corpus being
    * scored (the [[bigramLmScore]] self-scoring contract), every scored
    * bigram has c ≥ 1 > D and the max(·−D, 0) clamp is never active.
    *
    * Exactness (the q_lm_score treatment): every model statistic is an
    * INTEGER (occurrence counts, distinct-successor / distinct-context
    * type counts), the per-bigram log-probability is one fixed
    * double-expression tree over those integers — identical in the
    * DuckDB oracle — and the per-document mean accumulates in document
    * order on both engines before its round(·, 4).
    *
    * Plan: the bigram TYPE table aggregates once from the gram explode
    * and is PINNED (localCheckpoint) — it is the model artifact every
    * downstream table reads, and without the pin each of the three
    * model aggregations plus the scoring join would re-evaluate the
    * full corpus explode (audited: 4 corpus scans / 8 exchanges in the
    * unpinned draft vs 2 scans / 3 corpus-sized exchanges pinned — the
    * DSIR bucket-model lesson). The per-w1 and per-w2 tables are
    * vocabulary-sized (Heaps' law) and broadcast — pass
    * `broadcastVocab = false` at hash-token vocabulary scales to let
    * AQE decide; the type count is a 1-row broadcast scalar. Corpus
    * exchanges: gram-key aggregation, gram-key scoring join, id-key
    * mean. Nothing driver-side, nothing pairwise.
    */
  def knLmScore(
      df: DataFrame, id: String, text: String, discount: Double = 0.75,
      broadcastVocab: Boolean = true): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    val reserved = Seq("_gram", "_w1", "_w2", "_n_b", "_c_w1", "_n1p_w1",
      "_n1p_w2", "_n_types", "_lp", "n_bigrams", "lm_score_kn")
    require(!reserved.exists(df.columns.contains),
      s"knLmScore reserves columns ${reserved.mkString(", ")}")
    val grams = df.where(col(text).isNotNull)
      .select(col(id),
        explode(TextAnalysis.wordNgrams(col(text), 2)).as("_gram"))
      .withColumn("_w1", split(col("_gram"), " ").getItem(0))
      .withColumn("_w2", split(col("_gram"), " ").getItem(1))
    // the model artifact: one gram-key aggregation, pinned so its four
    // consumers (three model tables + the scoring join) never replay
    // the corpus explode
    val biTypes = grams.groupBy(col("_gram"))
      .agg(first(col("_w1")).as("_w1"), first(col("_w2")).as("_w2"),
        count(lit(1)).as("_n_b"))
      .localCheckpoint(true)
    val w1Stats = biTypes.groupBy(col("_w1"))
      .agg(sum(col("_n_b")).as("_c_w1"), count(lit(1)).as("_n1p_w1"))
    val w2Stats = biTypes.groupBy(col("_w2"))
      .agg(count(lit(1)).as("_n1p_w2"))
    val nTypes = biTypes.agg(count(lit(1)).as("_n_types"))
    val (w1H, w2H) =
      if (broadcastVocab) (broadcast(w1Stats), broadcast(w2Stats))
      else (w1Stats, w2Stats)
    val d = lit(discount)
    grams
      .join(biTypes.select(col("_gram"), col("_n_b")), Seq("_gram"))
      .join(w1H, Seq("_w1"))
      .join(w2H, Seq("_w2"))
      .crossJoin(broadcast(nTypes))
      .withColumn("_lp", log(
        (col("_n_b").cast("double") - d) / col("_c_w1").cast("double") +
          ((d * col("_n1p_w1").cast("double")) / col("_c_w1").cast("double")) *
            (col("_n1p_w2").cast("double") / col("_n_types").cast("double"))))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("_lp")), 4).as("lm_score_kn"))
  }

  /** FROZEN Kneser–Ney model artifact: the per-bigram scored lexicon
    * `(gram, _lpq)` with `_lpq = floor(lp · 10⁶)` — the interpolated-KN
    * log-prob of [[knLmScore]] quantized to an exact integer. This is
    * the deployable form of the LM: vocabulary-sized (bigram TYPES, not
    * corpus tokens — Heaps' law), broadcastable, and because scoring
    * against it is an INTEGER sum, a score computed anywhere (batch
    * re-score, streaming edge, another engine) is bit-identical.
    * `floor`, not `round`: floor's boundary set is exact integers —
    * unreachable from identical ln() doubles — while round-half
    * divergence between engines is the documented r10 hash-fail class.
    *
    * Same plan skeleton as [[knLmScore]]'s model half: one pinned
    * gram-type aggregation, vocabulary-sized joins, no corpus re-scan.
    */
  def knLmModel(
      df: DataFrame, text: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    val grams = df.where(col(text).isNotNull)
      .select(explode(TextAnalysis.wordNgrams(col(text), 2)).as("_gram"))
      .withColumn("_w1", split(col("_gram"), " ").getItem(0))
      .withColumn("_w2", split(col("_gram"), " ").getItem(1))
    val biTypes = grams.groupBy(col("_gram"))
      .agg(first(col("_w1")).as("_w1"), first(col("_w2")).as("_w2"),
        count(lit(1)).as("_n_b"))
      .localCheckpoint(true)
    val w1Stats = biTypes.groupBy(col("_w1"))
      .agg(sum(col("_n_b")).as("_c_w1"), count(lit(1)).as("_n1p_w1"))
    val w2Stats = biTypes.groupBy(col("_w2"))
      .agg(count(lit(1)).as("_n1p_w2"))
    val nTypes = biTypes.agg(count(lit(1)).as("_n_types"))
    val d = lit(discount)
    biTypes
      .join(broadcast(w1Stats), Seq("_w1"))
      .join(broadcast(w2Stats), Seq("_w2"))
      .crossJoin(broadcast(nTypes))
      .select(col("_gram"),
        floor(log(
          (col("_n_b").cast("double") - d) / col("_c_w1").cast("double") +
            ((d * col("_n1p_w1").cast("double")) / col("_c_w1").cast("double")) *
              (col("_n1p_w2").cast("double") / col("_n_types").cast("double")))
          * lit(1e6)).cast("long").as("_lpq"))
  }

  /** Score documents against a FROZEN [[knLmModel]] lexicon: per
    * document, the count of in-vocabulary bigrams and their mean
    * quantized log-prob, `lm_score_frozen` = Σ`_lpq` / (n · 10⁶) — ONE
    * division of exact longs, bit-identical in every engine and every
    * partitioning (the integer-sum determinism [[knLmScore]]'s double
    * mean lacks). Bigrams outside the lexicon contribute nothing and
    * don't count (the inner join drops them) — the frozen model has no
    * estimate for them, and silently scoring them as 0 would reward
    * OOV-heavy documents. Documents with no in-vocab bigram emit no
    * row. Plan: one gram explode, one broadcast lexicon join, one
    * id-keyed integer aggregation.
    */
  def knScoreFrozen(
      df: DataFrame, id: String, text: String, model: DataFrame): DataFrame = {
    val reserved = Seq("_gram", "_lpq", "n_bigrams", "lm_score_frozen")
    require(!reserved.exists(df.columns.contains),
      s"knScoreFrozen reserves columns ${reserved.mkString(", ")}")
    df.where(col(text).isNotNull)
      .select(col(id),
        explode(TextAnalysis.wordNgrams(col(text), 2)).as("_gram"))
      .join(broadcast(model), Seq("_gram"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("_lpq")).as("_sq"))
      .select(col(id), col("n_bigrams"),
        (col("_sq").cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double"))
          .as("lm_score_frozen"))
  }

  /** CCNet-style quality bucketing: split a scored corpus into `labels.length`
    * equal-population buckets by DESCENDING integer score — `labels.head`
    * (CCNet's "head") gets the best-scored third, and so on. The score
    * column must be an integer quantization (e.g. [[knLmScore]]'s
    * `lm_score_kn` × 10⁴ — the [[microScore]] idiom), which makes bucket
    * boundaries exact-integer arithmetic in every engine.
    *
    * Tie coherence: all documents sharing a score value land in the SAME
    * bucket (the bucket of the value's first rank), so boundary buckets
    * may deviate from n/K by the tied mass — the deterministic choice,
    * preferred over id-tiebroken splits that separate identical scores.
    *
    * Scale shape: bucket assignment never ranks row space. The score
    * histogram is bounded by the quantized VALUE DOMAIN (the [[QualityClassifier.topPGate]]
    * justification), the one ordered-cumulative window runs over that
    * bounded histogram, and the (value → bucket) table broadcasts back —
    * the corpus itself sees one broadcast join, no global sort.
    *
    * Output: the input plus `bucket` (a label from `labels`). Rows with a
    * NULL score are dropped (they never had a model estimate — CCNet
    * routes them to manual review, not to a bucket).
    */
  def perplexityBuckets(
      scored: DataFrame, scoreCol: String,
      labels: Seq[String] = Seq("head", "middle", "tail"),
      maxDistinctScores: Long = Relevance.MaxHistogramValues): DataFrame = {
    require(labels.length >= 2, s"need >= 2 buckets, got ${labels.length}")
    require(labels.distinct.length == labels.length,
      s"bucket labels must be distinct: $labels")
    Relevance.requireBoundedIntegerScore(scored, scoreCol, "perplexityBuckets")
    val reserved = Seq("_c", "_before", "_n", "_b", "bucket")
    reserved.foreach(c => require(!scored.columns.contains(c),
      s"input must not already contain reserved column $c"))
    val k = labels.length
    val nonNull = scored.where(col(scoreCol).isNotNull)
    // The histogram feeds THREE consumers (cumulative window, total agg,
    // assignment join); pin it or each consumer replays the caller's full
    // scoring plan. Bounded by the quantized value domain by contract, so
    // the checkpoint is small.
    val hist = nonNull.groupBy(col(scoreCol)).agg(count(lit(1)).as("_c"))
      .localCheckpoint(true)
    // Enforce the bounded-value-domain contract the single-partition
    // cumulative window below depends on: a caller sneaking a
    // corpus-cardinality score column through would otherwise build a
    // corpus-sized histogram and sort it on one task. The count is a
    // near-free action over the already-materialized checkpoint.
    val nVals = hist.count()
    require(nVals <= maxDistinctScores,
      s"perplexityBuckets: $nVals distinct $scoreCol values exceed the " +
        s"bounded-histogram ceiling $maxDistinctScores — quantize the score " +
        "to a coarser integer domain before bucketing, or raise " +
        "maxDistinctScores deliberately")
    val wCum = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val assign = hist
      .withColumn("_before", coalesce(sum(col("_c")).over(wCum), lit(0L)))
      .crossJoin(broadcast(hist.agg(sum(col("_c")).as("_n"))))
      .withColumn("_b",
        call_function("div", col("_before") * lit(k.toLong), col("_n")).cast("int"))
      .select(col(scoreCol), col("_b"))
    nonNull.join(broadcast(assign), Seq(scoreCol))
      .withColumn("bucket", element_at(typedlit(labels), col("_b") + 1))
      .drop("_b")
  }

  /** Freeze a [[perplexityBuckets]] assignment into per-bucket score
    * cutoffs — the deployable artifact for bucketing NEW documents at
    * the ingest edge without recomputing corpus quantiles: for each
    * label (best-first), the MINIMUM integer score batch assigned to
    * it. Assignment is monotone in the score value, so a frozen
    * when-chain over these cutoffs reproduces the batch bucket exactly
    * for every score value the corpus contained, and interpolates
    * deterministically (first bucket whose cutoff the score meets;
    * below every cutoff → last label) for unseen values. Labels the
    * tie-spill left EMPTY are simply absent from the chain — their
    * range belongs to the neighbor that absorbed it, which is exactly
    * what batch did. Driver-collects ≤ `labels.length` rows.
    */
  def bucketCutoffs(
      bucketed: DataFrame, scoreCol: String,
      labels: Seq[String] = Seq("head", "middle", "tail")): Seq[(String, Long)] = {
    val mins = bucketed.groupBy(col("bucket"))
      .agg(min(col(scoreCol)).as("_min"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val unknown = mins.keySet -- labels.toSet
    require(unknown.isEmpty, s"buckets outside the label set: $unknown")
    labels.flatMap(l => mins.get(l).map(l -> _))
  }

  /** The frozen-cutoff bucket expression shared by the batch re-scorer
    * and the streaming edge: first (best) bucket whose min-score cutoff
    * the document meets; below all cutoffs falls to the last label.
    */
  private[graft] def bucketExpr(
      scoreQ: Column, cutoffs: Seq[(String, Long)],
      fallback: String): Column = {
    require(cutoffs.nonEmpty, "cutoffs must not be empty (train them batch-side)")
    cutoffs.foldRight(lit(fallback): Column) {
      case ((label, cut), rest) => when(scoreQ >= cut, lit(label)).otherwise(rest)
    }
  }

  /** BM25 top-`k` retrieval: [[bm25]] then the global k best documents
    * (ties broken by id). TakeOrderedAndProject in the physical plan — a
    * per-partition top-k then a k-row driver merge, never a full sort.
    */
  def bm25TopK(
      df: DataFrame, id: String, text: String, queryTerms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    bm25(df, id, text, queryTerms, k1, b)
      .orderBy(microScore(col("score")).desc, col(id))
      .limit(k)
  }
}
