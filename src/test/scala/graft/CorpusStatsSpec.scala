package graft

import graft.ext.CorpusStats

/** Unit coverage for the corpus-curation statistics: boilerplate block
  * removal, vocabulary coverage, and the cross-source overlap matrix.
  * The DuckDB oracles check full-corpus parity; these pin the SEMANTICS
  * on hand-built corpora where the right answer is computable by eye.
  */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = (1 to 4).map(i => s"b$i").mkString(" ")

  test("removeFrequentBlocks drops blocks over the df cap, keeps order, empties fully-boilerplate docs") {
    // blockSize=4: doc text is consecutive 4-word blocks. `boiler` appears
    // in docs 1,2,3 (df=3 > cap 2) -> dropped everywhere; `rare` blocks
    // (df<=2) survive; doc 3 is ALL boilerplate -> clean_text "".
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 w1 w2 w3 w4"),
      (2L, s"v1 v2 v3 v4 $boiler"),
      (3L, boiler),
      (4L, "v1 v2 v3 v4 tail")) // shared with doc 2 at df=2 -> kept; short tail block
      .toDF("doc_id", "text")
    val out = CorpusStats.removeFrequentBlocks(docs, "doc_id", "text",
        blockSize = 4, dfCap = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((1L, "u1 u2 u3 u4 w1 w2 w3 w4", 3L, 1L)))
    assert(out(1) === ((2L, "v1 v2 v3 v4", 2L, 1L)))
    assert(out(2) === ((3L, "", 1L, 1L)))
    // order preserved through the struct sort: block then tail
    assert(out(3) === ((4L, "v1 v2 v3 v4 tail", 2L, 0L)))
  }

  test("removeFrequentBlocks: duplicate block within ONE doc does not count twice toward df") {
    val docs = Seq(
      (1L, s"$boiler $boiler"), // df contribution: 1 distinct doc
      (2L, boiler))             // df=2 <= cap -> everything kept
      .toDF("doc_id", "text")
    val out = CorpusStats.removeFrequentBlocks(docs, "doc_id", "text",
        blockSize = 4, dfCap = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0)._4 === 0L && out(0)._2 === s"$boiler $boiler")
    assert(out(1)._4 === 0L)
  }

  test("vocabCoverage: OOV rate against the corpus top-V with deterministic tiebreak") {
    // counts: a=3, b=2, c=2, z=1. topV=3 -> vocab {a,b,c} (count desc,
    // token asc breaks the b/c tie deterministically).
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a b c z"))
      .toDF("doc_id", "text")
    val out = CorpusStats.vocabCoverage(docs, "doc_id", "text", topV = 3)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out(0) === ((1L, 4L, 0L, 0.0)))
    assert(out(1) === ((2L, 4L, 1L, 0.25)))
  }

  test("sourceOverlap: shared distinct 3-grams and Jaccard per source pair") {
    // srcA grams: {p q r, q r s} ; srcB grams: {q r s, r s t} (two docs,
    // one duplicated gram proves DISTINCT semantics); srcC: no overlap.
    val docs = Seq(
      (1L, "A", "p q r s"),
      (2L, "B", "q r s t"),
      (3L, "B", "q r s"), // duplicate gram within B
      (4L, "C", "x y z"))
      .toDF("doc_id", "source", "text")
    val out = CorpusStats.sourceOverlap(docs, "source", "text", n = 3)
      .orderBy("src_a", "src_b").as[(String, String, Long, Double)].collect()
    // A∩B = {q r s} (1); |A|=2, |B|=2 -> jaccard 1/3. C pairs absent
    // (inner join on shared grams -> zero-overlap pairs don't appear).
    assert(out.toSeq === Seq(("A", "B", 1L, 1.0 / 3.0)))
  }

  test("zipfFit recovers slope -1 on an exact 1/rank corpus") {
    // freqs 12/rank: a x12, b x6, c x4, d x3 -> ln f = ln 12 - 1 * ln r,
    // a PERFECT fit, so slope/intercept are exact up to the 4-dp round
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.zipfFit(docs, "text", topR = 100)
      .as[(Long, Double, Double)].collect()
    assert(out.length === 1)
    val (n, slope, intercept) = out(0)
    assert(n === 4L)
    assert(slope === -1.0)
    assert(intercept === BigDecimal(math.log(12.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("zipfFit topR bounds the points and ranks break ties token-ascending") {
    val words = Seq.fill(5)("a") ++ Seq.fill(5)("b") ++
      Seq.fill(2)("c") ++ Seq("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = CorpusStats.zipfFit(docs, "text", topR = 2)
      .as[(Long, Double, Double)].collect()
    // two points (a r1, b r2 -- same freq, token-asc tiebreak), equal
    // freqs -> flat line: slope exactly 0, intercept ln(5)
    assert(out(0)._1 === 2L)
    assert(out(0)._2 === 0.0)
    assert(out(0)._3 === BigDecimal(math.log(5.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("heapsGrowth cumulates tokens and first-occurrence vocab per id bucket") {
    val docs = Seq(
      (0L, "a b"), (5L, "a c"),   // ckpt 0: 4 tokens, first-seen {a,b,c}
      (10L, "d"),                 // ckpt 1: 1 token, first-seen {d}
      (20L, "a e f"))             // ckpt 2: 3 tokens, first-seen {e,f}
      .toDF("doc_id", "text")
    val out = CorpusStats.heapsGrowth(docs, "doc_id", "text", 10L)
      .orderBy("ckpt").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 4L, 3L), (1L, 5L, 4L), (2L, 8L, 6L)))
  }

  test("heapsFit: growing vocab gives beta in (0,1); saturated corpus gives exactly 0") {
    // hand-built growth: checkpoints (N,V) = (10,4), (20,6), (40,9)
    val docs = Seq(
      (0L, (Seq.fill(7)("a") ++ Seq("b", "c", "d")).mkString(" ")),
      (10L, (Seq.fill(8)("a") ++ Seq("e", "f")).mkString(" ")),
      (20L, (Seq.fill(17)("b") ++ Seq("g", "h", "i")).mkString(" ")))
      .toDF("doc_id", "text")
    val fit = CorpusStats.heapsFit(docs, "doc_id", "text", 10L)
      .as[(Long, Double, Double)].collect()(0)
    assert(fit._1 === 3L)
    assert(fit._2 > 0.0 && fit._2 < 1.0)
    // the synthetic testdata corpus has a FIXED 31-type vocabulary, fully
    // seen in the first bucket: a flat growth curve, i.e. the fit
    // correctly reports beta = 0 -- the "templated corpus" red flag
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val a = CorpusStats.heapsFit(real, "doc_id", "text", 10L)
      .as[(Long, Double, Double)].collect()(0)
    val b = CorpusStats.heapsFit(real, "doc_id", "text", 10L)
      .as[(Long, Double, Double)].collect()(0)
    assert(a === b)
    assert(a._1 >= 3L)
    assert(a._2 === 0.0)
  }

  test("sourceOverlap and removeFrequentBlocks ignore NULL text") {
    val docs = Seq(
      (1L, Option("a b c d"), Option("A")),
      (2L, None: Option[String], Option("B")))
      .toDF("doc_id", "text", "source")
    assert(CorpusStats.removeFrequentBlocks(docs, "doc_id", "text", 4, 2)
      .count() === 1L)
    assert(CorpusStats.sourceOverlap(docs, "source", "text", 3).count() === 0L)
    assert(CorpusStats.vocabCoverage(docs, "doc_id", "text", 5).count() === 1L)
  }

  test("tokenDrift: snapshot-exclusive tokens outrank balanced ones") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, pmod, lit}
    val docs = Seq(
      (0L, "common common drifted drifted drifted"),
      (1L, "common common stable"),
      (2L, "common common drifted drifted"),
      (3L, "common common stable")).toDF("doc_id", "text")
    val got = graft.ext.CorpusStats.tokenDrift(
        docs, "text", pmod(col("doc_id"), lit(2)), topK = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 'drifted' appears only in the even snapshot, 'stable' only in the
    // odd one; 'common' is balanced and must rank below both
    assert(got.head._1 == "drifted" && got.head._2 == 5L && got.head._3 == 0L)
    assert(got.map(_._1).indexOf("common") > got.map(_._1).indexOf("stable"))
  }

  test("embeddingDrift: identical snapshots at cosine 1, disjoint axes at 0") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // even/odd rows carry the SAME vector -> centroids coincide
    val same = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f)), (3L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val r1 = graft.ext.CorpusStats.embeddingDrift(
        same, pmod(col("vec_id"), lit(2)), "embedding").collect().head
    assert((r1.getLong(0), r1.getLong(1)) == (2L, 2L))
    assert(r1.getDouble(2) == 1.0)
    // snapshot 0 lives on the x axis, snapshot 1 on the y axis
    val ortho = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f)), (3L, Array(0.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val r2 = graft.ext.CorpusStats.embeddingDrift(
        ortho, pmod(col("vec_id"), lit(2)), "embedding").collect().head
    assert(r2.getDouble(2) == 0.0)
  }

  test("embeddingDrift raises on an empty snapshot (advice r12)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // every row lands in snapshot 0 -> snapshot 1 has no centroid: loud
    // error, matching tokenDrift's contract (the oracle emits 0 rows)
    val oneSided = Seq(
      (0L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      graft.ext.CorpusStats.embeddingDrift(
        oneSided, pmod(col("vec_id"), lit(2)), "embedding").collect()
    }
    assert(e.getMessage.contains("embeddingDrift") ||
      Option(e.getCause).exists(_.getMessage.contains("embeddingDrift")))
  }

  test("meanVector enforces the declared-dims contract (advice r12)") {
    import spark.implicits._
    val good = Seq(Array(1.0f, 2.0f), Array(3.0f, 4.0f)).toDF("embedding")
    assert(graft.ext.CorpusStats.meanVector(good, "embedding", 2)
      .toSeq == Seq(2.0, 3.0))
    // longer vectors than declared: named error, not ArrayIndexOutOfBounds
    val longer = intercept[IllegalArgumentException] {
      graft.ext.CorpusStats.meanVector(good, "embedding", 1)
    }
    assert(longer.getMessage.contains("outside declared dims"))
    // shorter vectors than declared: a hole in the baseline is an error,
    // not a silent 0.0
    val shorter = intercept[IllegalArgumentException] {
      graft.ext.CorpusStats.meanVector(good, "embedding", 3)
    }
    assert(shorter.getMessage.contains("positions populated"))
    // mixed lengths where every position IS covered by some longer
    // vector (advice r13): the coverage check alone would pass, but the
    // per-position means would divide by differing counts — named error
    val ragged = Seq(Array(1.0f, 2.0f), Array(3.0f)).toDF("embedding")
    val mixed = intercept[IllegalArgumentException] {
      graft.ext.CorpusStats.meanVector(ragged, "embedding", 2)
    }
    assert(mixed.getMessage.contains("ragged per-position coverage"))
  }

  test("tokenDrift guards: invalid snapshots dropped, empty snapshot raises") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // snapshot value 2 is neither snapshot: its rows must not poison the
    // ranking with 0/0 = NaN scores (NaN sorts ABOVE every real double)
    val withInvalid = Seq(
      (0L, "alpha alpha"), (1L, "beta"), (2L, "ghost ghost ghost"))
      .toDF("doc_id", "text")
    val got = graft.ext.CorpusStats.tokenDrift(
        withInvalid, "text", col("doc_id").cast("int"), topK = 10)
      .collect()
    assert(!got.exists(_.getString(0) == "ghost"))
    assert(got.forall(r => !r.getDouble(3).isNaN))
    // one snapshot empty -> drift is undefined for every token: loud error
    val oneSided = Seq((0L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.ext.CorpusStats.tokenDrift(
        oneSided, "text", pmod(col("doc_id"), lit(2)), topK = 3).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("tokenDrift")), messages(e).mkString("; "))
  }
}
