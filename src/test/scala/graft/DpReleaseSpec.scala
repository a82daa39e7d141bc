package graft

import org.apache.spark.sql.functions._
import graft.ext.Privacy

/** Mechanism invariants for the seeded DP release: reproducibility,
  * seed sensitivity, noise centering/scale, clamping, suppression.
  */
class DpReleaseSpec extends SparkSpec {
  import spark.implicits._

  private def groups(n: Int) =
    (0 until n).flatMap(g => Seq.fill(100)(s"g$g")).toDF("g")

  test("same seed reproduces the release; a different seed moves it") {
    val df = groups(20)
    val a = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s1")
      .as[(String, Long)].collect().toMap
    val b = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s1")
      .as[(String, Long)].collect().toMap
    val c = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s2")
      .as[(String, Long)].collect().toMap
    assert(a === b)
    assert(a !== c, "independent seeds produced identical noise")
  }

  test("noise is centered with the Laplace scale (b = 1/epsilon)") {
    // 400 groups of exactly 100 rows: released - 100 IS the noise draw
    val noise = Privacy.dpCounts(groups(400), Seq("g"),
        epsilon = 0.5, seed = "spec-seed")
      .select(col("released") - 100).as[Long].collect()
    val mean = noise.sum.toDouble / noise.length
    // Laplace(b=2): sd = b*sqrt(2) ~ 2.83, se(mean) ~ 0.14
    assert(math.abs(mean) < 0.7, s"noise mean $mean not centered")
    val sd = math.sqrt(noise.map(x => (x - mean) * (x - mean)).sum / noise.length)
    assert(sd > 1.6 && sd < 4.5, s"noise sd $sd far from Laplace b=2")
    // noise actually varies across groups
    assert(noise.distinct.length > 5)
  }

  test("suppression drops groups under the published floor") {
    val df = Seq.fill(500)("big").union(Seq.fill(2)("tiny")).toDF("g")
    val kept = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5,
        seed = "spec-seed", suppressBelow = 100L)
      .select("g").as[String].collect().toSeq
    assert(kept === Seq("big"))
  }

  test("dpSum clamps each row's contribution to the sensitivity bound") {
    // one outlier of 10^9 must move the released sum by at most hi
    val base = (1 to 100).map(i => ("g", 50L))
    val out = Privacy.dpSum(base.toDF("g", "v"), Seq("g"), "v",
      lo = 0L, hi = 100L, epsilon = 1.0, seed = "s")
      .as[(String, Long)].head()._2
    val withOutlier = Privacy.dpSum(
      (base :+ (("g", 1000000000L))).toDF("g", "v"), Seq("g"), "v",
      lo = 0L, hi = 100L, epsilon = 1.0, seed = "s")
      .as[(String, Long)].head()._2
    // same key -> same noise draw, so the delta is exactly the clamp
    assert(withOutlier - out === 100L)
  }

  test("parameter guards") {
    val df = Seq(("a", 1L)).toDF("g", "v")
    intercept[IllegalArgumentException](
      Privacy.dpCounts(df, Seq.empty, 0.5, "s"))
    intercept[IllegalArgumentException](
      Privacy.dpCounts(df, Seq("g"), 0.0, "s"))
    intercept[IllegalArgumentException](
      Privacy.dpSum(df, Seq("g"), "v", 5L, 5L, 0.5, "s"))
  }
  test("count and sum noise over the same groups are DOMAIN-SEPARATED") {
    // advice r14: with noise keyed on (seed, group) alone, a count at
    // b=2 and a sum at b=100000 draw from the SAME uniform, so
    // 50000*count_noise - sum_noise cancels the Laplace noise down to
    // rounding error. With the mechanism/scale fold the draws decorrelate.
    val df = groups(50).withColumn("v", lit(10L))
    val cNoise = Privacy.dpCounts(df, Seq("g"), epsilon = 0.5, seed = "s")
      .select(col("g"), (col("released") - 100).as("nc"))
      .as[(String, Long)].collect().toMap
    val sNoise = Privacy.dpSum(df, Seq("g"), "v", lo = 0L, hi = 50000L,
        epsilon = 0.5, seed = "s")
      .select(col("g"), (col("released") - 1000).as("ns"))
      .as[(String, Long)].collect().toMap
    // the r14 attack statistic: residual after the scale-ratio cancel;
    // correlated draws leave |residual| <= ~25000 on EVERY group, while
    // independent Laplace(100000) draws scatter far beyond it
    val residuals = cNoise.keys.toSeq.map(g => 50000L * cNoise(g) - sNoise(g))
    assert(residuals.exists(r => math.abs(r) > 25000L),
      s"count/sum noise still correlated: residuals ${residuals.take(5)}...")
  }

  test("epsilon ledger: charges accumulate, over-budget release rejected") {
    val ledger = new Privacy.EpsilonLedger(budget = 1.0)
    ledger.charge("events", 0.5)
    ledger.charge("events", 0.3)
    assert(math.abs(ledger.spent("events") - 0.8) < 1e-9)
    assert(math.abs(ledger.remaining("events") - 0.2) < 1e-9)
    // a DIFFERENT dataset has its own budget line
    ledger.charge("documents", 1.0)
    // the over-budget release never runs
    intercept[IllegalArgumentException](ledger.charge("events", 0.3))
    assert(math.abs(ledger.spent("events") - 0.8) < 1e-9)
    intercept[IllegalArgumentException](ledger.charge("events", -0.1))
    intercept[IllegalArgumentException](new Privacy.EpsilonLedger(0.0))
  }

  test("durable epsilon ledger: spends survive across instances sharing a path") {
    // the r15 advisory: a process-local ledger lets a SECOND driver (a
    // restart, or another pipeline on the same served data) release past
    // the budget because it never saw the first driver's spends. A
    // path-backed ledger reads the durable state on every charge.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dp_ledger_").toString
    val first = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    first.charge("events", 0.7)
    assert(math.abs(first.spent("events") - 0.7) < 1e-9)
    // a SECOND instance on the same path (the restarted driver) sees the
    // first's spend and rejects the over-budget release
    val second = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    assert(math.abs(second.spent("events") - 0.7) < 1e-9)
    intercept[IllegalArgumentException](second.charge("events", 0.5))
    // within budget still goes through, and the FIRST instance sees it too
    second.charge("events", 0.3)
    assert(math.abs(first.remaining("events") - 0.0) < 1e-9)
    intercept[IllegalArgumentException](first.charge("events", 0.01))
    // per-dataset lines are independent in the durable file as well
    second.charge("documents", 1.0)
    intercept[IllegalArgumentException](second.charge("documents", 0.1))
    // delimiter hygiene: keys that would corrupt the file are refused
    intercept[IllegalArgumentException](second.charge("a\tb", 0.1))
    // a rejected charge leaves the durable state untouched
    val third = new Privacy.EpsilonLedger(budget = 1.0, path = Some(dir))
    assert(math.abs(third.spent("events") - 1.0) < 1e-9)
  }

  test("windowed release column: fresh noise per window, reproducible") {
    val df = Seq(
      ("a", 100L, 100L), ("a", 200L, 100L), ("b", 100L, 100L))
      .toDF("g", "w", "n")
    def rel = df.select(col("g"), col("w"),
      Privacy.dpWindowedCountsColumn("s", 0.5, col("g"), col("w"),
        col("n")).as("released"))
    val a = rel.as[(String, Long, Long)].collect().toSet
    assert(a == rel.as[(String, Long, Long)].collect().toSet)
    // the window start participates in the key: same group, different
    // windows, identical exact counts -> different draws
    val byKey = a.map { case (g, w, r) => (g, w) -> (r - 100L) }.toMap
    assert(byKey(("a", 100L)) != byKey(("a", 200L)) ||
      byKey(("a", 100L)) != byKey(("b", 100L)))
  }
}
