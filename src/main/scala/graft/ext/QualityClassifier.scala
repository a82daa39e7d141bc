package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText-shaped filter behind the classic "train a tiny classifier on
  * curated positives, score the crawl" corpus-curation recipe (the GPT-3
  * and LLaMA data pipelines both gate on exactly this kind of model).
  *
  * Everything is Spark-native with BOUNDED driver state:
  *  - features: tokens hash into `dims` buckets (`pmod(xxhash64, dims)`),
  *    L1-normalized per document — one (id, bucket)-keyed aggregation;
  *  - training: full-batch logistic-regression gradient descent where
  *    each iteration is ONE distributed pass (a per-document score
  *    window, then a bucket-keyed gradient aggregation of at most
  *    `dims + 1` rows collected to the driver — the weight vector is the
  *    only driver state, ~8 KB at the default 1024 dims);
  *  - the intercept is a synthetic always-on feature (bucket = dims), so
  *    no special-case bias plumbing exists anywhere;
  *  - gradient sums go through DECIMAL(28,18), so training is
  *    BIT-DETERMINISTIC across partitionings and reruns (the suite's
  *    fp-determinism policy, same as q_embed_meanpool) — asserted in the
  *    spec by training twice and comparing weights exactly.
  *
  * At 100 TB: train on a bounded sample (a quality classifier needs
  * thousands of labeled examples, not the whole crawl), then [[score]]
  * the full corpus — scoring is one window pass, no driver involvement.
  */
object QualityClassifier {

  final case class Model(dims: Int, weights: Array[Double]) {
    require(weights.length == dims + 1,
      s"weights must have dims+1 entries (intercept last), got ${weights.length}")
    def bias: Double = weights(dims)
  }

  /** Hashed, L1-normalized bag-of-words features plus the intercept
    * feature: one row per (doc, bucket) with `x` = token share (and the
    * constant `x = 1` intercept row at bucket = dims). Documents with no
    * non-empty token produce no rows — there is no text to judge.
    */
  def hashedFeatures(
      df: DataFrame, id: String, text: String, dims: Int): DataFrame = {
    require(dims >= 2, s"dims must be >= 2, got $dims")
    val reserved = Seq("bucket", "x", "_tok", "_cnt", "_n")
    require(!reserved.exists(df.columns.contains),
      s"hashedFeatures reserves columns ${reserved.mkString(", ")}")
    val counts = df.where(col(text).isNotNull)
      .select(col(id), explode(TextAnalysis.tokens(col(text))).as("_tok"))
      .where(col("_tok") =!= "")
      .withColumn("bucket", pmod(xxhash64(col("_tok")), lit(dims)).cast("int"))
      .groupBy(col(id), col("bucket")).agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy(id)
    val feats = counts
      .withColumn("x",
        col("_cnt").cast("double") / sum(col("_cnt")).over(w).cast("double"))
      .drop("_cnt")
    // intercept: an always-on unit feature per document
    feats.unionByName(
      feats.select(col(id)).distinct()
        .withColumn("bucket", lit(dims))
        .withColumn("x", lit(1.0)))
  }

  /** Per-row linear score contribution for the current weights, via a
    * plan-literal weight map — weights ride the plan, never a join.
    */
  private def zPart(weights: Array[Double]): Column = {
    val wMap = typedlit(weights.zipWithIndex.map { case (v, i) => i -> v }.toMap)
    col("x") * element_at(wMap, col("bucket"))
  }

  /** Train logistic regression on `labeled` (must carry a 0/1 double
    * label column). Full-batch gradient descent, `iters` passes, constant
    * `lr`. Deterministic: decimal gradient sums, fixed iteration count,
    * zero-initialized weights.
    */
  def train(
      labeled: DataFrame, id: String, text: String, label: String,
      dims: Int = 1024, iters: Int = 50, lr: Double = 2.0): Model = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(lr > 0, s"lr must be > 0, got $lr")
    // features + label, materialized ONCE: every iteration re-reads this
    // table, and without truncation each pass would replay the explode
    val feats = hashedFeatures(labeled, id, text, dims)
      .join(labeled.select(col(id), col(label).cast("double").as("_y")), Seq(id))
      .localCheckpoint(true)
    val nDocs = feats.select(col(id)).distinct().count().toDouble
    require(nDocs > 0, "no trainable documents (all empty or NULL text)")
    val w = new Array[Double](dims + 1)
    val docW = Window.partitionBy(id)
    for (_ <- 0 until iters) {
      // one distributed pass: per-doc z (window over the id partition),
      // sigmoid error, bucket-keyed decimal gradient aggregation
      val grads = feats
        // the per-doc z is ALSO a decimal sum: a double window sum folds
        // in partition-arbitrary order and would break bit-determinism
        .withColumn("_z",
          sum(zPart(w).cast("decimal(28,18)")).over(docW).cast("double"))
        .withColumn("_err",
          lit(1.0) / (lit(1.0) + exp(-col("_z"))) - col("_y"))
        .withColumn("_g", (col("_err") * col("x")).cast("decimal(28,18)"))
        .groupBy(col("bucket")).agg(sum(col("_g")).as("_grad"))
        .collect() // <= dims + 1 rows — the documented bounded driver step
      grads.foreach { r =>
        val b = r.getInt(0)
        w(b) -= lr * r.getDecimal(1).doubleValue() / nDocs
      }
    }
    Model(dims, w)
  }

  /** Score documents with a trained model: `quality_prob` =
    * sigmoid(w·x + b) per document. One feature aggregation + one window
    * pass — no driver involvement, no join (weights are plan literals).
    * Documents with no tokens are absent (no features to score).
    */
  def score(
      df: DataFrame, id: String, text: String, model: Model): DataFrame =
    hashedFeatures(df, id, text, model.dims)
      .groupBy(col(id))
      .agg(sum(zPart(model.weights).cast("decimal(28,18)"))
        .cast("double").as("_z"))
      .select(col(id),
        (lit(1.0) / (lit(1.0) + exp(-col("_z")))).as("quality_prob"))
}
