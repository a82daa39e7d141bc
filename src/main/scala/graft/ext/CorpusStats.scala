package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

/** Corpus-level text statistics for training-data curation: boilerplate
  * block removal (the CCNet/RefinedWeb "drop lines repeated across many
  * documents" pass, over fixed-width word blocks since this corpus has no
  * newlines), vocabulary coverage / OOV rate against the corpus's own
  * top-V tokens (the "how well would a tokenizer trained here cover this
  * doc" signal), and cross-source n-gram overlap (which data subsets leak
  * into each other — the subset-level contamination matrix).
  *
  * All three are posting-list shaped: one exchange keyed on the text unit
  * (block / token / gram), never an all-pairs document join. Reference
  * behaviors these generalize: the reference's dedup/cleaning stages
  * (reference: src/pipeline.py:30-44) act on whole rows; these act on
  * sub-document units, which is what large-corpus curation actually
  * needs.
  */
object CorpusStats {

  /** Non-overlapping `blockSize`-word blocks of a pre-split token-array
    * COLUMN (must be a materialized attribute, not the tokenizer
    * expression — a lambda over the raw `split()` would re-run the regex
    * per block; see TextAnalysis.wordNgrams' shape note). Each block is
    * its words joined by single spaces; the tail block may be shorter.
    */
  private def wordBlocks(toks: Column, blockSize: Int): Column =
    transform(
      sequence(lit(0), ceil(size(toks) / lit(blockSize.toDouble)).cast("int") - 1),
      i => array_join(slice(toks, i * blockSize + 1, lit(blockSize)), " "))

  /** Boilerplate removal: drop every block that occurs in more than
    * `dfCap` DISTINCT documents, and reassemble each document from its
    * surviving blocks in order. Returns
    * `(id, clean_text, n_blocks, n_dropped)`.
    *
    * Shape: explode blocks once → block-keyed document-frequency count
    * (one exchange; map-side partial aggregation) → the SMALL frequent
    * set (df > cap is the Zipf head — tiny by construction) joins back
    * against the exploded blocks → one per-document aggregation
    * reassembles text via sort-by-position structs. Nothing driver-side;
    * at 100 TB the frequent set is broadcastable and everything else is
    * the two keyed exchanges.
    */
  def removeFrequentBlocks(
      df: DataFrame, id: String, text: String,
      blockSize: Int = 10, dfCap: Int = 2): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    val blocks = df.where(col(text).isNotNull)
      .select(col(id), TextAnalysis.tokens(col(text)).as("_toks"))
      .select(col(id), posexplode(wordBlocks(col("_toks"), blockSize))
        .as(Seq("pos", "block")))
    val frequent = blocks.groupBy("block")
      .agg(countDistinct(col(id)).as("_df"))
      .where(col("_df") > dfCap)
      .select(col("block"), lit(1).as("_freq"))
    blocks.join(frequent, Seq("block"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("_freq").isNotNull, 1L).otherwise(0L)).as("n_dropped"),
        // collect_list skips the NULLs the `when` leaves for dropped
        // blocks; struct sort is by the unique per-doc position
        array_join(transform(
          array_sort(collect_list(when(col("_freq").isNull,
            struct(col("pos"), col("block"))))),
          x => x("block")), " ").as("clean_text"))
      .select(col(id), col("clean_text"), col("n_blocks"), col("n_dropped"))
  }

  /** The corpus's `topV` most frequent tokens (count-desc, token-asc
    * tiebreak) — the trained artifact [[vocabCoverage]] scores against,
    * exposed so a batch-trained vocab can gate a STREAM
    * (StreamingPipeline.vocabGateStream). Top-V via
    * TakeOrderedAndProject — no global sort.
    */
  def topVocab(df: DataFrame, text: String, topV: Int): DataFrame =
    df.where(col(text).isNotNull)
      .select(explode(TextAnalysis.tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("_cnt"))
      .orderBy(col("_cnt").desc, col("w")).limit(topV)
      .select(col("w"))

  /** Per-document OOV rate against the corpus's own `topV` most frequent
    * tokens (count-desc, token-asc tiebreak — deterministic across
    * engines). Returns `(id, n_tokens, n_oov, oov_rate)`; `oov_rate` is
    * an identical-operand long/long double division, bit-exact
    * cross-engine.
    *
    * Shape: one token-keyed count (exchange #1), top-V via
    * TakeOrderedAndProject (no global sort), broadcast of the V-row
    * vocab back onto the token stream, one per-document aggregation
    * (exchange #2).
    */
  def vocabCoverage(
      df: DataFrame, id: String, text: String, topV: Int = 30): DataFrame = {
    val tok = df.where(col(text).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("w"))
    val vocab = topVocab(df, text, topV).withColumn("_in_vocab", lit(1))
    tok.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** Cross-source contamination matrix: for every source pair (a < b),
    * the number of DISTINCT word `n`-grams they share and the Jaccard of
    * their gram sets. Returns `(src_a, src_b, shared_grams, jaccard)`.
    *
    * Shape: distinct (source, gram) once (the one big exchange), then a
    * gram-keyed self-join whose per-gram fan-out is bounded by the
    * SOURCE count squared — sources are a small dimension (data subsets,
    * not documents), so this never degenerates into a document cross
    * product no matter the corpus size.
    */
  def sourceOverlap(
      df: DataFrame, source: String, text: String, n: Int = 3): DataFrame = {
    val grams = df.where(col(text).isNotNull)
      .select(col(source).as("source"),
        explode(TextAnalysis.wordNgrams(col(text), n)).as("g"))
      .distinct()
    val perSrc = grams.groupBy("source").agg(count(lit(1)).as("_n"))
    val shared = grams.as("a")
      .join(grams.as("b"),
        col("a.g") === col("b.g") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_grams"))
    shared
      .join(perSrc.select(col("source").as("src_a"), col("_n").as("_na")), "src_a")
      .join(perSrc.select(col("source").as("src_b"), col("_n").as("_nb")), "src_b")
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        (col("shared_grams").cast("double") /
          (col("_na") + col("_nb") - col("shared_grams")).cast("double"))
          .as("jaccard"))
  }

  /** Token-frequency drift between two corpus snapshots — the monitor
    * that catches a crawl delivery whose content distribution shifted
    * (new boilerplate, a language mix change, a spam burst) BEFORE it
    * trains anything. Per token shared by name across snapshots, the
    * chi-square-style statistic
    * `(c0·N1 − c1·N0)² / ((c0+c1)·N0·N1)` ranks the most divergent
    * tokens (c = per-snapshot count, N = snapshot total); top-`topK`
    * by (score desc, token).
    *
    * Numerics (advice r10): every FACTOR casts to double BEFORE any
    * multiply — a long formulation (c0·N1, (c0+c1)·N0·N1) silently wraps
    * under non-ANSI multiplication once snapshot totals reach ~3e9
    * (N0·N1 > 2^63), garbling the ranking at exactly the corpus scale
    * this monitor targets. Double products never wrap: they are exact
    * while c·N ≤ 2^53 and correctly rounded beyond, and since the whole
    * score is a fixed tree of single IEEE ops (no SUM of doubles
    * anywhere), it stays bit-identical cross-engine at any scale.
    *
    * Guards (advice r10): snapshot values outside {0, 1} are dropped up
    * front (a token seen only under an invalid snapshot would otherwise
    * score 0/0 = NaN, and NaN sorts ABOVE every real score in Spark,
    * poisoning the top-k); an EMPTY snapshot (N0 or N1 = 0) makes drift
    * undefined for every token, so the score expression raises a
    * descriptive error instead of returning an all-NaN ranking.
    * One tokenize+aggregate shuffle, scalar totals broadcast, top-k as
    * TakeOrderedAndProject — no global sort.
    */
  def tokenDrift(
      df: DataFrame, text: String, snapshot: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tok = df.where(col(text).isNotNull)
      .select(snapshot.cast("int").as("_snap"),
        explode(TextAnalysis.tokens(col(text))).as("token"))
      .where(col("token") =!= "" && col("_snap").isin(0, 1))
    val counts = tok.groupBy("token").agg(
      sum(when(col("_snap") === 0, 1L).otherwise(0L)).as("c0"),
      sum(when(col("_snap") === 1, 1L).otherwise(0L)).as("c1"))
    val totals = counts.agg(sum("c0").as("_n0"), sum("c1").as("_n1"))
    val (c0d, c1d) = (col("c0").cast("double"), col("c1").cast("double"))
    val (n0d, n1d) = (col("_n0").cast("double"), col("_n1").cast("double"))
    val diff = c0d * n1d - c1d * n0d
    val den = (c0d + c1d) * n0d * n1d
    counts.crossJoin(broadcast(totals))
      .withColumn("score",
        when(col("_n0") > 0 && col("_n1") > 0, (diff * diff) / den)
          .otherwise(raise_error(concat(
            lit("tokenDrift: a snapshot has no tokens (N0="), col("_n0"),
            lit(", N1="), col("_n1"), lit(")")))))
      .select("token", "c0", "c1", "score")
      .orderBy(col("score").desc, col("token"))
      .limit(topK)
  }

  /** Closed-form least-squares fit of `y = intercept + slope·x` over a
    * point set: `(n_points, slope, intercept)` rounded to 4 decimals.
    *
    * Cross-engine exactness (the q_stats_moments treatment): each ln term
    * is floored to a 1e-9-scaled fixed-point integer BEFORE summation, and
    * the power sums accumulate as DECIMAL(38,0) — exact integers, immune
    * to summation-order drift (double sums here flipped q_heaps_fit's 4th
    * decimal between Spark and DuckDB in r8). The DuckDB oracle mirrors
    * this with HUGEINT sums; both engines then divide bit-identical
    * doubles. The 1e9 scale cancels in the slope; the intercept divides
    * it back out. Per-term floor truncation (≤1e-9, in ln units) is 5+
    * orders below the round(·, 4) reporting precision.
    */
  private def lnLnFit(pts: DataFrame, x: Column, y: Column): DataFrame = {
    val d19 = DataTypes.createDecimalType(19, 0)
    val d38 = DataTypes.createDecimalType(38, 0)
    val xf = floor(x * lit(1e9)).cast(d19)
    val yf = floor(y * lit(1e9)).cast(d19)
    val agg = pts.agg(
      count(lit(1)).cast(d38).as("_n"),
      sum(xf).cast(d38).as("_sx"), sum(yf).cast(d38).as("_sy"),
      sum(xf * yf).cast(d38).as("_sxy"), sum(xf * xf).cast(d38).as("_sxx"))
    val num = (col("_n") * col("_sxy") - col("_sx") * col("_sy")).cast("double")
    val den = (col("_n") * col("_sxx") - col("_sx") * col("_sx")).cast("double")
    agg.select(
      col("_n").cast("long").as("n_points"),
      round(num / den, 4).as("slope"),
      round((col("_sy").cast("double") - num / den * col("_sx").cast("double")) /
        col("_n").cast("double") / lit(1e9), 4).as("intercept"))
  }

  /** Zipf's-law fit: least-squares slope of `ln(freq) ~ ln(rank)` over
    * the corpus's `topR` most frequent tokens — the sanity signal that a
    * (possibly synthetic or over-filtered) corpus still has a natural
    * rank-frequency head (slope ≈ −1 for natural text). Returns ONE row
    * `(n_points, slope, intercept)`.
    *
    * Shape: one token-keyed count, top-R via TakeOrderedAndProject (no
    * global sort — R is a constant), rank assignment + regression on the
    * R-row result. Corpus size only affects the first exchange.
    */
  def zipfFit(df: DataFrame, text: String, topR: Int = 100): DataFrame = {
    val top = df.where(col(text).isNotNull)
      .select(explode(TextAnalysis.tokens(col(text))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w")).limit(topR)
    val ranked = top.withColumn("r",
      row_number().over(Window.orderBy(col("f").desc, col("w"))))
    lnLnFit(ranked, log(col("r").cast("double")), log(col("f").cast("double")))
  }

  /** Heaps'-law growth table: cumulative token count vs cumulative
    * DISTINCT vocabulary size at id-bucket checkpoints (`bucket =
    * id div step`, cumulated in id order). Returns
    * `(ckpt, cum_tokens, cum_vocab)` — exact integers, bit-exact
    * cross-engine. The vocabulary-growth curve is the standard check that
    * a corpus keeps contributing new types (a flattening curve means the
    * tail is duplicated/templated content).
    *
    * Shape: vocabulary growth WITHOUT any sequential scan over documents —
    * each token's first-occurrence id (one token-keyed min), both series
    * bucketed to `id div step` (two tiny aggregates), and the running
    * sums windowed over the CHECKPOINT rows only (bounded by id-range /
    * step, never corpus-sized — the single-partition window is over ~tens
    * of rows no matter the corpus).
    */
  def heapsGrowth(
      df: DataFrame, id: String, text: String, step: Long): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    val tok = df.where(col(text).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("w"))
    val tokB = tok
      .groupBy(expr(s"$id div $step").as("ckpt"))
      .agg(count(lit(1)).as("_nt"))
    val vocB = tok.groupBy("w").agg(min(col(id)).as("_first"))
      .groupBy(expr("_first div " + step).as("ckpt"))
      .agg(count(lit(1)).as("_nv"))
    val w = Window.orderBy("ckpt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokB.join(vocB, Seq("ckpt"), "left")
      .select(col("ckpt"),
        sum(col("_nt")).over(w).as("cum_tokens"),
        sum(coalesce(col("_nv"), lit(0L))).over(w).as("cum_vocab"))
  }

  /** Heaps'-law exponent: least-squares fit of `ln(cum_vocab) ~
    * ln(cum_tokens)` over the [[heapsGrowth]] checkpoints — `slope` is
    * the Heaps β (≈0.4–0.8 for natural text, →0 for a saturated /
    * heavily duplicated corpus). ONE row `(n_points, slope, intercept)`.
    */
  def heapsFit(
      df: DataFrame, id: String, text: String, step: Long): DataFrame =
    lnLnFit(heapsGrowth(df, id, text, step),
      log(col("cum_tokens").cast("double")),
      log(col("cum_vocab").cast("double")))

  /** Embedding-space drift between two corpus snapshots — the companion
    * to [[tokenDrift]] for the REPRESENTATION layer: a crawl delivery
    * whose token mix looks stable can still shift semantically (same
    * vocabulary, different topics), and the first-order signal is the
    * cosine between the two snapshots' mean-pooled centroids. One row
    * out: `(n0, n1, centroid_cosine)`.
    *
    * Exactness: per-dim means use the [[Similarity.meanPoolEmbeddings]]
    * decimal treatment (exact DECIMAL(20,10) sums, one double division —
    * order-independent), the per-snapshot mean vectors assemble in pos
    * order, and the final cosine is [[Similarity.cosineHof]]'s ordered
    * fold — so the single output double is bit-identical cross-engine
    * before its round(4). Snapshot values outside {0, 1} are dropped,
    * and — aligning with [[tokenDrift]]'s empty-snapshot contract
    * (advice r12) — a snapshot with NO vectors raises a descriptive
    * error: drift between a corpus and nothing is undefined, and the
    * silent NULL row previously diverged from the oracle's zero-row
    * cross-join shape.
    *
    * Scale shape: one (snap, pos) aggregation (map-side combined, the
    * exchange carries 2·dims rows per partition), then a 2-row pivot —
    * the corpus is scanned once and never joined.
    */
  def embeddingDrift(
      df: DataFrame, snapshot: Column, vec: String): DataFrame =
    df.where(col(vec).isNotNull && snapshot.isin(0, 1))
      .select(snapshot.cast("int").as("_snap"),
        posexplode(col(vec)).as(Seq("pos", "_v")))
      .groupBy("_snap", "pos")
      .agg(
        (sum(col("_v").cast("double").cast("decimal(20,10)")).cast("double") /
          count(lit(1)).cast("double")).as("_mean"),
        count(lit(1)).as("_n"))
      .groupBy("_snap")
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("_mean")))),
          m => m("_mean")).as("_m"),
        max("_n").as("_n"))
      .agg(
        first(when(col("_snap") === 0, col("_n")), ignoreNulls = true).as("n0"),
        first(when(col("_snap") === 1, col("_n")), ignoreNulls = true).as("n1"),
        round(graft.ext.Similarity.cosineHof(
          first(when(col("_snap") === 0, col("_m")), ignoreNulls = true),
          first(when(col("_snap") === 1, col("_m")), ignoreNulls = true)), 4)
          .as("centroid_cosine"))
      .select(col("n0"), col("n1"),
        when(col("n0").isNotNull && col("n1").isNotNull, col("centroid_cosine"))
          .otherwise(raise_error(concat(
            lit("embeddingDrift: a snapshot has no vectors (n0="),
            coalesce(col("n0").cast("string"), lit("0")),
            lit(", n1="), coalesce(col("n1").cast("string"), lit("0")),
            lit(")"))).cast("double"))
          .as("centroid_cosine"))

  /** The frozen baseline for [[graft.streaming.StreamingPipeline.embeddingDriftStream]]:
    * the corpus centroid as a bounded driver-side vector (`dims` doubles
    * — same decimal-exact per-dim mean as [[embeddingDrift]]). The
    * centroid is the trained artifact; the stream compares each window's
    * centroid against it.
    */
  def meanVector(df: DataFrame, vec: String, dims: Int): Array[Double] = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    val rows = df.where(col(vec).isNotNull)
      .select(posexplode(col(vec)).as(Seq("pos", "_v")))
      .groupBy("pos")
      .agg((sum(col("_v").cast("double").cast("decimal(20,10)")).cast("double") /
        count(lit(1)).cast("double")).as("_mean"),
        count(lit(1)).as("_n"))
      .collect()
    require(rows.nonEmpty, "meanVector: no vectors")
    // Declared-dims contract (advice r12, tightened r13): a position
    // at/past `dims` means a vector LONGER than declared; a position
    // with no rows means every vector was SHORTER than declared; and a
    // position whose row count differs from the others means SOME
    // vectors were shorter (mixed lengths — per-position means would
    // divide by differing counts). All three violate the
    // frozen-baseline shape the streaming twin indexes by (its
    // vecShapeGuard requires size === dims), so fail with a named error
    // instead of OOB-crashing / zero-filling / silently averaging over
    // ragged coverage.
    val out = new Array[Double](dims)
    var covered = 0
    val counts = new Array[Long](dims)
    rows.foreach { r =>
      val p = r.getInt(0)
      require(p >= 0 && p < dims,
        s"meanVector: vector position $p outside declared dims=$dims " +
          "(input carries longer vectors than the contract)")
      out(p) = r.getDouble(1)
      counts(p) = r.getLong(2)
      covered += 1
    }
    require(covered == dims,
      s"meanVector: only $covered of $dims declared positions populated " +
        "(input carries shorter vectors than the contract)")
    require(counts.distinct.length == 1,
      s"meanVector: ragged per-position coverage (counts ${counts.min}.." +
        s"${counts.max}) — input mixes vector lengths; filter to " +
        s"size == $dims first")
    out
  }
}
