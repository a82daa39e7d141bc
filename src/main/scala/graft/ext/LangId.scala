package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Character-n-gram Naive Bayes language identification — the real
  * model behind every production langid stack (TextCat / langid.py /
  * CLD: char 3-gram profiles + multinomial NB), replacing the
  * 3-language stopword heuristic [[TextAnalysis.languageId]] for
  * multilingual corpora. The heuristic stays as the zero-training
  * fallback; this trains IN SPARK on any labeled slice and scores the
  * rest.
  *
  * Model (multinomial NB over hashed char trigrams):
  *
  *   score(d, l) = ln P(l) + Σ_{g ∈ grams(d)} ln P(bucket(g) | l)
  *   P(b | l)    = (c_{l,b} + 1) / (N_l + dims)        (add-one)
  *
  * Features are char trigrams of the whitespace-collapsed lowercased
  * text, hashed into `dims` buckets with the shared engine-portable md5
  * bucket hash ([[QualityClassifier.bucketOf]]) — hashing bounds the
  * model at `langs × dims` longs regardless of corpus size (the
  * bounded-driver-artifact pattern the GD classifier and DSIR follow).
  * The model grid is COMPLETE over the bucket space (zero-count buckets
  * carry the smoothed floor), so scoring is a plain inner join — no
  * per-language missing-bucket bias.
  *
  * Determinism (the DSIR exactness treatment): each `ln P(b|l)` and
  * each prior is ONE fixed tree of IEEE ops evaluated once per model
  * CELL (≤ langs·dims evaluations), floor-quantized at 10⁻⁶ to a long;
  * per-document scores are then EXACT integer sums and the argmax is an
  * exact integer comparison with an ascending-language tiebreak — the
  * oracle replays everything in BIGINT CTEs.
  *
  * Scale shape: training is one explode + (lang, bucket) aggregation
  * (map-side combined; the exchange carries ≤ langs·dims rows per
  * partition); the trained grid pivots WIDE (bucket → one long column
  * per language, `dims` rows, broadcast), so scoring joins each gram
  * occurrence ONCE — the gram table never multiplies by the language
  * count — and aggregates straight to the document. Nothing pairwise;
  * the only driver materialization is the langs×dims model (bounded by
  * contract).
  */
object LangId {

  /** Log quantization scale — scores are 10⁻⁶-scaled-log longs. */
  private[graft] val LogScale = 1000000L

  /** Feature canonicalization: lowercase, whitespace collapsed to
    * single spaces. MUST be materialized in a projection BEFORE
    * [[charNgramsOf]] — the gram transform is a CodegenFallback
    * higher-order function, and an inlined regex subtree would
    * re-execute per ELEMENT (O(len²) regex work per document; measured
    * 17.8 s → 2.8 s on the sf0.1 corpus — the single-reference-builder
    * lesson from UrlOps).
    */
  private[graft] def canonText(text: Column): Column =
    regexp_replace(lower(text), "\\s+", " ")

  /** Char n-grams of an ALREADY-CANONICALIZED text column: positions
    * 1..len−n+1, each `n` chars. Shorter-than-n text (and NULL) yields
    * an empty array. DuckDB replay: `list_transform(range(1,
    * length(t) - (n-2)), i -> substr(t, i, n))` over
    * `regexp_replace(lower(text), '\s+', ' ', 'g')`.
    */
  private[graft] def charNgramsOf(t: Column, n: Int): Column =
    when(t.isNotNull && length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => t.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** [[canonText]] + [[charNgramsOf]] in one expression — fine for
    * tests and one-off use; hot paths project the canonical text first
    * (see [[canonText]]).
    */
  private[graft] def charNgrams(text: Column, n: Int): Column =
    charNgramsOf(canonText(text), n)

  /** The frozen language-id artifact: per-language priors and the
    * complete per-bucket conditional log-probability grid, all in
    * 10⁻⁶-scaled-log longs. `lpq(i)(b)` is the quantized
    * `ln P(b | langs(i))`. Bounded by contract at `langs.length × dims`
    * longs — the driver-side collect in [[train]] is of THIS, never of
    * a corpus.
    */
  case class LangIdModel(
      langs: Array[String], dims: Int, n: Int,
      priorQ: Array[Long], lpq: Array[Array[Long]]) {
    require(langs.nonEmpty && langs.length == priorQ.length &&
      langs.length == lpq.length && lpq.forall(_.length == dims),
      "model arrays must be langs-aligned and dims-wide")
  }

  /** Train the NB model on a labeled slice. Distributed: one explode +
    * (lang, bucket) count aggregation and a per-lang doc/total count;
    * only the ≤ langs×dims quantized grid is collected.
    *
    * Rows with NULL lang or NULL/too-short text contribute no grams
    * (their language's prior still counts the document if lang is
    * non-NULL and text non-NULL).
    */
  def train(
      labeled: DataFrame, lang: String, text: String,
      dims: Int = 256, n: Int = 3): LangIdModel = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    require(n >= 1, s"n must be >= 1, got $n")
    val base = labeled.where(col(lang).isNotNull && col(text).isNotNull)
    // per-(lang, bucket) gram counts — map-side combined to <= L*dims;
    // canonical text materializes in its own projection (see canonText)
    val counts = base
      .select(col(lang).as("_lang"), canonText(col(text)).as("_t"))
      .select(col("_lang"), explode(charNgramsOf(col("_t"), n)).as("_g"))
      .withColumn("_b", QualityClassifier.bucketOf(col("_g"), dims))
      .groupBy("_lang", "_b").agg(count(lit(1)).as("_c"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val docCounts = base.groupBy(col(lang).as("_lang"))
      .agg(count(lit(1)).as("_docs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(docCounts.nonEmpty, "train: no labeled documents")
    val langs = docCounts.keys.toArray.sorted
    val totalDocs = docCounts.values.sum
    // quantize in the driver with the SAME fixed expression the oracle
    // replays: floor((ln(c+1) - ln(N_l+dims)) * 1e6)
    val lpq = langs.map { l =>
      val nL = (0 until dims).map(b => counts.getOrElse((l, b), 0L)).sum
      Array.tabulate(dims) { b =>
        val c = counts.getOrElse((l, b), 0L)
        math.floor((math.log(c + 1.0) - math.log(nL + dims.toDouble)) *
          LogScale).toLong
      }
    }
    val priorQ = langs.map { l =>
      math.floor((math.log(docCounts(l).toDouble) -
        math.log(totalDocs.toDouble)) * LogScale).toLong
    }
    LangIdModel(langs, dims, n, priorQ, lpq)
  }

  /** The model grid as a broadcastable `dims`-row frame: `(_b, _lp_0 ..
    * _lp_{L-1})` — one long column per language, so scoring touches each
    * gram occurrence exactly once.
    */
  private[graft] def modelFrame(spark: SparkSession, m: LangIdModel): DataFrame = {
    val schema = StructType(StructField("_b", LongType, nullable = false) +:
      m.langs.indices.map(i =>
        StructField(s"_lp_$i", LongType, nullable = false)))
    val rows = (0 until m.dims).map { b =>
      Row.fromSeq(b.toLong +: m.langs.indices.map(i => m.lpq(i)(b)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Score documents against a frozen model:
    * `(id, lang_pred, scoreq, marginq)` — `scoreq` the winning
    * language's full quantized NB score (prior + gram sum), `marginq`
    * the integer gap to the runner-up language (0 on an exact tie; 0
    * by definition for a single-language model). The margin is the
    * CONFIDENCE signal real langid stacks threshold on: route
    * `marginq < threshold` documents to `und`/human review instead of
    * trusting a coin-flip argmax. Documents with no grams (NULL or
    * shorter-than-n text) are absent — no likelihood evidence, the
    * [[ImportanceResampling]] contract.
    */
  def score(
      docs: DataFrame, id: String, text: String,
      model: LangIdModel): DataFrame = {
    val reserved = Seq("_g", "_b", "_ss", "lang_pred", "scoreq", "marginq") ++
      model.langs.indices.flatMap(i => Seq(s"_lp_$i", s"_s_$i"))
    require(!reserved.exists(docs.columns.contains),
      s"score reserves columns ${reserved.mkString(", ")}")
    // One-pass native scoring (optimization r20): the per-language gram
    // sums come from a single codegen'd expression per row
    // ([[graft.functions.LangScoreImpl]]) instead of exploding every
    // char n-gram, hashing it as a projection, broadcast-joining the
    // model and shuffling per-gram rows into a per-doc aggregate —
    // ~len(text) exchange rows per document become zero (a pure map
    // over the scan). Long sums are order-independent, so the scores
    // are bit-identical to the composed form (LangIdSpec pins the
    // equality; the unused `spark` parameter of modelFrame remains for
    // the streaming twin, which keeps the composed shape for its
    // windowed-state contract).
    val sums = docs.where(col(text).isNotNull)
      .select(col(id).as(id),
        graft.functions.LangScoreFunctions.lang_gram_sums_q(
          canonText(col(text)), model.n, model.dims, model.lpq).as("_ss"))
      .where(col("_ss").isNotNull)
      .select(col(id) +: model.langs.indices.map(i =>
        col("_ss").getItem(i).as(s"_s_$i")): _*)
    val (bl, bs, bm) = argmaxExpr(model)
    sums.select(col(id), bl, bs, bm)
  }

  /** The gram → bucket projection shared by batch and streaming: only
    * `keep` columns ride the explode (the gram payload dominates row
    * width — never carry the full document row through it).
    */
  private[graft] def bucketedGrams(
      docs: DataFrame, keep: Seq[String], text: String,
      model: LangIdModel): DataFrame =
    docs.where(col(text).isNotNull)
      .select(keep.map(col).toIndexedSeq :+
        canonText(col(text)).as("_t"): _*)
      .select(keep.map(col).toIndexedSeq :+
        explode(charNgramsOf(col("_t"), model.n)).as("_g"): _*)
      .withColumn("_b",
        QualityClassifier.bucketOf(col("_g"), model.dims).cast("long"))
      .drop("_g")

  /** Per-language raw gram-sum aggregate columns (`_s_i`). */
  private[graft] def sumCols(model: LangIdModel): Seq[Column] =
    model.langs.indices.map(i => sum(col(s"_lp_$i")).as(s"_s_$i"))

  /** Integer argmax over the prior-adjusted `_s_i` columns with an
    * ascending-language tiebreak: langs are sorted, the fold walks from
    * the LAST language down, and `>=` lets earlier languages win ties —
    * the exact order `row_number() OVER (ORDER BY scoreq DESC, lang)`
    * yields in the oracle. The margin is best − runner-up (excluded by
    * LANGUAGE identity, so an exact tie yields margin 0 — identical to
    * the oracle's rn=1 − rn=2 gap); a 1-language model has no
    * runner-up and margins 0.
    */
  private[graft] def argmaxExpr(
      model: LangIdModel): (Column, Column, Column) = {
    val scores = model.langs.indices
      .map(i => col(s"_s_$i") + lit(model.priorQ(i)))
    val init = (lit(model.langs.last), scores.last)
    val (bl, bs) = model.langs.indices.reverse.foldLeft(init) {
      case ((l, s), i) =>
        (when(scores(i) >= s, lit(model.langs(i))).otherwise(l),
          when(scores(i) >= s, scores(i)).otherwise(s))
    }
    val bm =
      if (model.langs.length < 2) lit(0L)
      else {
        val masked = model.langs.indices.map(i =>
          when(lit(model.langs(i)) === bl, lit(Long.MinValue))
            .otherwise(scores(i)))
        bs - greatest(masked: _*)
      }
    (bl.as("lang_pred"), bs.as("scoreq"), bm.as("marginq"))
  }
}
