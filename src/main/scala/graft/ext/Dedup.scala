package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, in increasing
  * fuzziness: exact (hash groupBy), n-gram Jaccard (relational set
  * overlap), MinHash+LSH (banded signature buckets), SimHash (bitwise
  * near-dup), and embedding-cosine near-dup.
  *
  * Scale design: every variant reduces to groupBy/join on a derived key —
  * no pairwise O(n²) stage ever touches the full corpus. Candidate
  * generation is always a bucket join (band hash, simhash band, LSH
  * signature), and only bucket-mates are verified.
  */
object Dedup {

  /** Exact dedup on a content key: keeps the row with the smallest id per
    * distinct key. One shuffle on the (hashed) key.
    */
  def exactGroups(df: DataFrame, id: String, key: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word 1-grams per document — the unit for Jaccard overlap. */
  def docTokens(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id), explode(array_distinct(TextAnalysis.tokens(col(text)))).as("tok"))

  /** Exact n-gram Jaccard similarity for all pairs sharing >= 1 token.
    * Relational formulation: token-postings self-join -> shared counts ->
    * |A ∪ B| = |A| + |B| - shared. Quadratic in bucket size — bound the
    * input (or pre-bucket with MinHash below) at scale.
    */
  def ngramJaccardPairs(
      df: DataFrame, id: String, text: String, threshold: Double): DataFrame = {
    val toks = docTokens(df, id, text).cache()
    val sizes = toks.groupBy(id).agg(count(lit(1)).as("n_toks"))
    val a = toks.withColumnRenamed(id, "id1")
    val b = toks.withColumnRenamed(id, "id2")
    val shared = a.join(b, Seq("tok"))
      .filter(col("id1") < col("id2"))
      .groupBy("id1", "id2").agg(count(lit(1)).as("shared"))
    val s1 = sizes.withColumnRenamed(id, "id1").withColumnRenamed("n_toks", "n1")
    val s2 = sizes.withColumnRenamed(id, "id2").withColumnRenamed("n_toks", "n2")
    shared.join(broadcast(s1), Seq("id1")).join(broadcast(s2), Seq("id2"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("n1") + col("n2") - col("shared")), 4))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** MinHash signature: k minimums of per-permutation token hashes,
    * computed in ONE pass over the token array with nested higher-order
    * functions (no explode, no shuffle). Permutation i is the keyed hash
    * xxhash64(i, token).
    */
  def minhashSignature(text: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(array_distinct(TextAnalysis.tokens(text)),
        t => xxhash64(i, t))))

  /** MinHash+LSH candidate pairs: signatures are cut into `bands` bands of
    * `rowsPerBand` values; documents agreeing on any whole band land in
    * the same bucket. Pairs are generated ONLY within buckets (the classic
    * shingle→minhash→band→bucket-join pipeline), then deduplicated across
    * bands. Probability of a pair surfacing ≈ 1-(1-j^r)^b for Jaccard j.
    */
  def minhashCandidatePairs(
      df: DataFrame, id: String, text: String,
      bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sig = df.select(col(id), minhashSignature(col(text), k).as("sig"))
    val banded = sig.select(col(id),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))
          .cast("array<string>").cast("string")))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val a = banded.withColumnRenamed(id, "id1")
    val b = banded.withColumnRenamed(id, "id2")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** 64-bit SimHash over word tokens: each token's xxhash64 votes ±1 per
    * bit position, the sign of each accumulated bit forms the fingerprint.
    * One pass, pure Column expressions.
    */
  def simhash64(text: Column): Column = {
    val toks = array_distinct(TextAnalysis.tokens(text))
    val counters = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (c, i) => c + when(
            call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L))
      })
    aggregate(
      zip_with(counters, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0,
          call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, z) => acc + z)
  }

  /** SimHash near-dup candidates: bucket on the high 16 bits (a band), then
    * verify with full Hamming distance <= maxHamming within buckets. At
    * scale, repeat with rotated bands for recall (4 bands of 16 bits
    * guarantee finding all pairs within Hamming distance 3).
    */
  def simhashPairs(df: DataFrame, id: String, text: String, maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(id), simhash64(col(text)).as("sim"))
    val bucketed = sigs.withColumn("bucket", shiftright(col("sim"), 48))
    val a = bucketed.select(col(id).as("id1"), col("sim").as("sim1"), col("bucket"))
    val b = bucketed.select(col(id).as("id2"), col("sim").as("sim2"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id1") < col("id2"))
      .withColumn("hamming", bit_count(col("sim1").bitwiseXOR(col("sim2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Embedding-cosine near-duplicates: LSH-bucketed candidate pairs
    * verified by exact cosine >= threshold.
    */
  def embeddingNearDupPairs(
      df: DataFrame, id: String, vec: String,
      threshold: Double, bits: Int = 10): DataFrame = {
    val sigs = df.withColumn("_sig", Similarity.hyperplaneSignature(col(vec), bits))
    val a = sigs.select(col(id).as("id1"), col(vec).as("v1"), col("_sig"))
    val b = sigs.select(col(id).as("id2"), col(vec).as("v2"), col("_sig"))
    a.join(b, Seq("_sig"))
      .filter(col("id1") < col("id2"))
      .withColumn("cosine", round(Similarity.cosine(col("v1"), col("v2")), 4))
      .filter(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
  }
}
