package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016): the
  * iterative merge loop, not just one pair count. Each iteration counts
  * all adjacent symbol pairs across the corpus (weighted by word
  * frequency), picks the most frequent pair (count-desc, pair-asc
  * tiebreak — fully deterministic), and rewrites every word's symbol
  * sequence with that pair merged, left-to-right non-overlapping.
  *
  * Scale shape — the classic trick makes this cluster-friendly: training
  * runs on the DISTINCT-WORD dictionary with frequencies, never on the
  * corpus. One corpus-keyed exchange builds the dictionary; after that,
  * every iteration is one pair-keyed aggregation over the (small)
  * dictionary plus a ONE-ROW collect for the argmax — the same bounded
  * driver-state pattern as the gradient-descent classifier
  * (QualityClassifier) and quantizer training (Similarity). The merge
  * rewrite is a fold over each word's symbol array; words are short, the
  * dictionary is vocabulary-sized, and the per-iteration result is
  * cached so lineage doesn't re-evaluate k growing expression trees.
  *
  * The loop stops early when no pair reaches `minCount` — merging
  * singleton noise would just memorize hapax words.
  */
object BpeTrainer {

  /** Adjacent symbol pairs of a symbol-array COLUMN as "a b" strings:
    * zip of the array with its shift-by-one (the wordNgrams shape — no
    * per-element re-evaluation of anything expensive), null-padded tail
    * filtered off.
    */
  private[graft] def adjacentPairs(syms: Column): Column =
    filter(
      zip_with(syms, slice(syms, lit(2), size(syms)),
        (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
      x => x.isNotNull)

  /** Left-to-right non-overlapping merge of (a, b) -> a+b in one symbol
    * array: a fold that either replaces the accumulator's tail element
    * (when it is `a` and the incoming symbol is `b`) or appends. A
    * symbol produced by a merge can never immediately re-merge as the
    * `a` of the same pair because a+b is strictly longer than a —
    * matching the reference algorithm's scan semantics.
    */
  private[graft] def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) === 0, array(x))
          .otherwise(when(element_at(acc, -1) === lit(a) && x === lit(b),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
            .otherwise(concat(acc, array(x)))))

  /** Run `numMerges` BPE iterations over `textCol`; returns the learned
    * merge table `(step, pair, n)` — step is 1-based merge order, n the
    * frequency-weighted count that won the step.
    */
  /** Shared merge-count floor — referenced by the trainer default AND
    * the generated DuckDB oracle's early-stop predicate, so the two
    * cannot drift apart silently (advice r9).
    */
  private[graft] val DefaultMinCount = 2L

  def train(
      spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, minCount: Long = DefaultMinCount): DataFrame = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // corpus -> distinct-word dictionary with frequencies (the ONE
    // corpus-sized exchange), words split to character symbols. The dict
    // is vocabulary-sized (sublinear in the corpus by Heaps' law), so it
    // coalesces to a few partitions: the loop below scans it ~2·numMerges
    // times, and 32 near-empty tasks per scan cost more scheduling than
    // the data justifies.
    var dict = docs.where(col(textCol).isNotNull)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        expr("filter(split(w, ''), x -> x != '')").as("syms"))
      .coalesce(8)
      .cache()

    // ONE job per SCAN, not two: the pair-count scan of the current dict
    // is also what fills its cache (a cached frame materializes on first
    // scan), so the rewritten dict needs no explicit count() barrier —
    // the PREVIOUS generation just stays persisted until the scan that
    // reads through it has run, then unpersists.
    //
    // Each scan collects the top-M ranked pair table (M small — the
    // collect stays bounded) and merges a BATCH of pairs before the next
    // scan, cutting driver round-trips from numMerges to ~numMerges/2-3.
    // The batch is chosen so the output is PROVABLY IDENTICAL to the
    // strict one-merge-per-scan algorithm (BpeTrainerSpec pins the
    // equality): take the maximal PREFIX of the (n desc, pair asc)
    // ranking whose members are pairwise symbol-disjoint — including
    // each member's merged token, so no earlier merge can create or
    // destroy a later member's occurrences — and guard against a
    // CREATED pair outranking a later member: a merge (a,b) can only
    // create pairs (x, ab) / (ab, y) with counts bounded by count(x,a)
    // / count(b,y), both visible in the top-M table (anything outside
    // is bounded by the M-th count). A candidate joins the batch only
    // if every earlier member's created-pair bound stays strictly below
    // the candidate's count, so at each unrolled sequential step the
    // argmax is exactly the next batch member.
    val merges = Seq.newBuilder[(Int, String, Long)]
    var prev: DataFrame = null
    var step = 1
    var done = false
    val topM = 256
    while (step <= numMerges && !done) {
      val ranked = dict
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("n"))
        .orderBy(col("n").desc, col("pair"))
        .limit(topM).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // dict's cache is now filled; its parent generation is free
      if (prev != null) { prev.unpersist(); prev = null }
      if (ranked.isEmpty || ranked(0)._2 < minCount) done = true
      else {
        val nM = if (ranked.length == topM) ranked.last._2 else 0L
        val batch = Seq.newBuilder[(String, String, Long)]
        var selected = List.empty[(String, String, Long)]
        var used = Set.empty[String]
        var open = true
        for ((pair, n) <- ranked if open && n >= minCount
            && step + selected.length <= numMerges) {
          val Array(a, b) = pair.split(" ", 2)
          val safe = selected.isEmpty ||
            (!used(a) && !used(b) && selected.forall { case (aj, bj, nj) =>
              val left = ranked.collect {
                case (p, c) if p.endsWith(" " + aj) => c }.maxOption.getOrElse(0L)
              val right = ranked.collect {
                case (p, c) if p.startsWith(bj + " ") => c }.maxOption.getOrElse(0L)
              math.min(nj, math.max(nM, math.max(left, right))) < n
            })
          if (safe) {
            selected = selected :+ ((a, b, n))
            used = used ++ Set(a, b, a + b)
          } else open = false
        }
        batch ++= selected
        val sel = batch.result()
        sel.foreach { case (a, b, n) =>
          merges += ((step, s"$a $b", n)); step += 1
        }
        val next = dict
          .select(col("freq"),
            sel.foldLeft(col("syms")) { case (c, (a, b, _)) =>
              mergePair(c, a, b) }.as("syms"))
          .cache()
        prev = dict
        dict = next
      }
    }
    if (prev != null) prev.unpersist()
    dict.unpersist()
    import spark.implicits._
    merges.result().toDF("step", "pair", "n")
  }

  /** Apply a learned merge table to ONE word: the same left-to-right
    * non-overlapping replace as [[mergePair]], replayed imperatively for
    * each merge in training order — so encoding a training-corpus word
    * with the full merge list reproduces the training dictionary's final
    * symbol sequence exactly (the consistency invariant BpeTrainerSpec
    * pins).
    */
  private[graft] def encodeWord(
      word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: List[String] = word.split("").filter(_.nonEmpty).toList
    merges.foreach { case (a, b) =>
      if (syms.lengthCompare(2) >= 0) {
        val out = scala.collection.mutable.ListBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == a && x == b)
            out(out.length - 1) = a + b
          else out += x
        }
        syms = out.toList
      }
    }
    syms
  }

  /** Tokenize a corpus with a TRAINED merge list (the inference half of
    * the train→encode→pack loop): per-document
    * `(id, n_tokens, n_subwords, fertility)`, fertility = subwords per
    * word (identical-operand long/long division — bit-exact).
    *
    * Scale shape: the imperative merge replay runs ONLY on the
    * DISTINCT-WORD dictionary — a UDF is the right tool there (the
    * algorithm is an inherently sequential per-word rewrite, and the
    * dictionary is vocabulary-sized, sublinear in the corpus by Heaps'
    * law). Every corpus-sized path stays relational: one explode, one
    * distinct, one dictionary join-back, one per-document aggregation.
    * `merges` are "a b" pair strings in training order, as produced by
    * [[train]].
    */
  def encode(
      docs: DataFrame, id: String, textCol: String,
      merges: Seq[String]): DataFrame = {
    val pairs = merges.map { m =>
      val Array(a, b) = m.split(" ", 2); (a, b)
    }
    SubwordEncode.fertility(docs, id, textCol,
      w => (encodeWord(w, pairs).length, 0), emitUnk = false)
  }
}
