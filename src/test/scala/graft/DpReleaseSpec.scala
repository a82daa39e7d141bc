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
}
