package graft

import org.apache.spark.sql.functions._

import graft.ext.Sketches

/** KMV sketch invariants: exact below k, bounded error above, the merge
  * theorem, and the quadratic-pairs guard.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("below k the sketch IS the set: estimate equals the exact count") {
    val df = (0 until 40).map(i => ("a", i.toLong)).toDF("t", "k")
    val est = Sketches.kmvDistinct(
      Sketches.kmvSketch(df, "t", col("k"), 64), 64)
      .as[(String, Long, Long)].head()
    assert(est === (("a", 40L, 40L)))
  }

  test("above k the estimator lands within 15% of the truth") {
    val df = (0 until 5000).map(i => ("a", i.toLong)).toDF("t", "k")
    val est = Sketches.kmvDistinct(
      Sketches.kmvSketch(df, "t", col("k"), 256), 256)
      .select("est").as[Long].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.15, s"est=$est")
  }

  test("pair stats: planted 1/3 Jaccard overlap is recovered approximately") {
    val a = (0L until 1000L).map(("a", _))
    val b = (500L until 1500L).map(("b", _))
    val df = (a ++ b).toDF("t", "k")
    val r = Sketches.kmvPairStats(
      Sketches.kmvSketch(df, "t", col("k"), 128), 128)
      .select("jaccard_q", "union_est", "inter_est")
      .as[(Long, Long, Long)].head()
    assert(math.abs(r._1 - 333333.0) < 120000, s"jaccard_q=${r._1}")
    assert(math.abs(r._2 - 1500.0) / 1500.0 < 0.2, s"union_est=${r._2}")
    assert(math.abs(r._3 - 500.0) / 500.0 < 0.45, s"inter_est=${r._3}")
  }

  test("merge theorem: the union's k-mins all come from the two sketches") {
    val a = (0L until 800L).map(("a", _))
    val b = (400L until 1200L).map(("b", _))
    val df = (a ++ b).toDF("t", "k")
    val k = 64
    val sk = Sketches.kmvSketch(df, "t", col("k"), k)
      .select("h").as[Long].collect().toSet
    val union = Sketches.kmvSketch(
      df.withColumn("t", lit("u")), "t", col("k"), k)
      .select("h").as[Long].collect().toSet
    assert(union.subsetOf(sk), "union k-mins escaped the per-set sketches")
  }

  test("windowed merge equals a direct sketch of the window's union") {
    // periods 0..9, each with keys [100p, 100p+60): 3-period windows
    // overlap by 40 keys with each neighbor period
    val rows = for (p <- 0L until 10L; i <- 0L until 60L) yield (p, p * 100 + i)
    val df = rows.toDF("day", "k")
    val k = 32
    val windowed = Sketches.kmvWindowDistinct(
        Sketches.kmvSketch(df, "day", col("k"), k), k, windowPeriods = 3)
      .select("g", "est").as[(Long, Long)].collect().toMap
    // direct: per end period, sketch the union of its window's raw keys
    for (end <- 0L until 10L) {
      val union = rows.filter { case (p, _) => p <= end && p >= end - 2 }
        .map { case (_, key) => ("u", key) }
      val direct = Sketches.kmvDistinct(
        Sketches.kmvSketch(union.toDF("day", "k"), "day", col("k"), k), k)
        .select("est").as[Long].head()
      assert(windowed(end) === direct, s"end=$end")
    }
    // estimator sanity on the full windows (180 distinct keys, k=32)
    assert(math.abs(windowed(5L) - 180.0) / 180.0 < 0.3)
  }

  test("kmvPairStats fails fast above maxGroups") {
    val df = (0 until 20).map(i => (s"g$i", i.toLong)).toDF("t", "k")
    val sk = Sketches.kmvSketch(df, "t", col("k"), 8)
    val e = intercept[IllegalArgumentException] {
      Sketches.kmvPairStats(sk, 8, maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
  }
}
