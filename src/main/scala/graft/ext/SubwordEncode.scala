package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ONE corpus-safe subword-encode skeleton, shared by all three
  * tokenizers ([[BpeTrainer.encode]], [[UnigramTrainer.encode]],
  * [[WordPieceTrainer.encode]]): tokenize → explode → DISTINCT-word
  * dictionary → per-word scorer UDF over the dictionary only → join
  * back → per-document aggregate.
  *
  * The invariant this factoring enforces by construction: the scorer —
  * the only non-relational step — runs on the distinct-word dictionary,
  * which is vocabulary-sized and sublinear in the corpus by Heaps' law,
  * NEVER on corpus-sized rows. Every corpus-sized path stays relational
  * (one explode, one distinct, one dictionary join-back, one
  * aggregation), so a new tokenizer plugged in here cannot accidentally
  * ship a per-token UDF.
  */
private[ext] object SubwordEncode {

  /** Per-document fertility census. `scoreWord` maps a dictionary word
    * to (subword count, unk flag 0/1); it must be a pure function of
    * the word and the (driver-bounded) model it closes over. With
    * `emitUnk` the output carries `n_unk` (the WordPiece contract);
    * without, the classic (n_tokens, n_subwords, fertility) shape.
    */
  def fertility(
      docs: DataFrame, id: String, textCol: String,
      scoreWord: String => (Int, Int), emitUnk: Boolean): DataFrame = {
    val enc = udf((w: String) => {
      val (ns, unk) = scoreWord(w); Array(ns, unk)
    })
    val tok = docs.where(col(textCol).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
    val dict = tok.select("w").distinct()
      .withColumn("_e", enc(col("w")))
      .select(col("w"), col("_e")(0).as("_ns"), col("_e")(1).as("_unk"))
    val grouped = tok.join(dict, "w").groupBy(col(id))
    val agged =
      if (emitUnk)
        grouped.agg(count(lit(1)).as("n_tokens"),
          sum(col("_ns").cast("long")).as("n_subwords"),
          sum(col("_unk").cast("long")).as("n_unk"))
      else
        grouped.agg(count(lit(1)).as("n_tokens"),
          sum(col("_ns").cast("long")).as("n_subwords"))
    agged.withColumn("fertility",
      col("n_subwords").cast("double") / col("n_tokens").cast("double"))
  }
}
