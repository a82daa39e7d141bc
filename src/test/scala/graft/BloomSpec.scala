package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sketches, TextAnalysis}

/** Bloom-filter membership screen: build/screen/packed-screen/dedup
  * invariants on real document data.
  */
class BloomSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val M = 4096
  private val K = 4

  private def docs = graft.queries.QueryDef.table(spark, dir, "documents")
    .filter(col("text").isNotNull)

  private def corpusFp = docs.filter(col("doc_id") % 2 === 0)
    .select(TextAnalysis.fingerprint(col("text")).as("fp"))

  test("bloomIndex emits at most mBits/32 words, all with set bits") {
    val idx = Sketches.bloomIndex(corpusFp, col("fp"), M, K).collect()
    assert(idx.length > 0 && idx.length <= M / 32)
    assert(idx.forall(r => r.getLong(0) >= 0 && r.getLong(0) < M / 32))
    assert(idx.forall(r => r.getLong(1) != 0L))
    // every word is a 32-bit mask packed in a long
    assert(idx.forall(r => (r.getLong(1) >>> 32) == 0L))
  }

  test("no false negatives: every corpus member screens maybe_seen") {
    val idx = Sketches.bloomIndex(corpusFp, col("fp"), M, K)
    val self = Sketches.bloomScreen(idx, corpusFp.distinct(), col("fp"), M, K)
    assert(self.filter(!col("maybe_seen")).count() === 0)
  }

  test("packed screen equals relational screen row-for-row") {
    val idx = Sketches.bloomIndex(corpusFp, col("fp"), M, K)
    val batch = docs.select(col("doc_id"),
      TextAnalysis.fingerprint(col("text")).as("fp"))
    val a = Sketches.bloomScreen(idx, batch, col("fp"), M, K)
      .select("doc_id", "maybe_seen").orderBy("doc_id").collect()
    val b = Sketches.bloomScreenPacked(Sketches.bloomPack(idx, M), batch,
        col("fp"), M, K)
      .select("doc_id", "maybe_seen").orderBy("doc_id").collect()
    assert(a.length > 0)
    assert(a.toSeq == b.toSeq)
  }

  test("tiny filter saturates: false positives occur and are survived") {
    // 32 bits for hundreds of keys => filter is all-ones => everything
    // is a maybe; the exact verify stage must still return the true
    // anti-join answer.
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1).select("doc_id", "text")
    val viaBloom = Dedup.bloomDedup(batch, corpus, "text", mBits = 32, k = 2)
      .select("doc_id").orderBy("doc_id").collect()
    val exact = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select("doc_id").orderBy("doc_id").collect()
    // incrementalDedup also collapses within-batch dups; doc_id is
    // unique here and texts may repeat within the batch, so compare
    // against the pure anti-join instead.
    val fp = TextAnalysis.fingerprint(col("text"))
    val anti = batch.withColumn("_f", fp)
      .join(corpus.select(fp.as("_f")), Seq("_f"), "left_anti")
      .select("doc_id").orderBy("doc_id").collect()
    assert(viaBloom.toSeq == anti.toSeq)
    assert(exact.length <= anti.length)
  }

  test("screen and packed screen flag NULL keys as NULL") {
    import spark.implicits._
    val idx = Sketches.bloomIndex(corpusFp, col("fp"), M, K)
    val batch = Seq((1L, Option("deadbeef")), (2L, Option.empty[String]))
      .toDF("id", "fp")
    val r = Sketches.bloomScreen(idx, batch, col("fp"), M, K)
      .orderBy("id").select("maybe_seen").collect()
    assert(!r(0).isNullAt(0) && r(1).isNullAt(0))
    val p = Sketches.bloomScreenPacked(Sketches.bloomPack(idx, M), batch,
        col("fp"), M, K)
      .orderBy("id").select("maybe_seen").collect()
    assert(!p(0).isNullAt(0) && p(1).isNullAt(0))
  }

  test("reserved-column guards fire") {
    val batch = docs.select(col("doc_id"), col("text"),
      lit(1L).as("maybe_seen"))
    val idx = Sketches.bloomIndex(corpusFp, col("fp"), M, K)
    intercept[IllegalArgumentException] {
      Sketches.bloomScreen(idx, batch, col("text"), M, K)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomScreenPacked(Sketches.bloomPack(idx, M), batch,
        col("text"), M, K)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomIndex(corpusFp, col("fp"), mBits = 100, k = K)
    }
  }
}
