package graft

import org.apache.spark.sql.functions._

import graft.etl.{Anomaly, Funnel}
import graft.ext.FuzzyJoin

/** Beaconing-CV and funnel-progression invariants on hand-built streams. */
class SecurityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("beaconScores: a planted timer is flagged, bursty traffic is not") {
    // Timer: exactly 60s cadence. Bursty: exponential-ish spread gaps.
    val timer = (0 until 21).map(i => (1L, "c2", 60000000L * i, i.toLong))
    val bursty = Seq(0L, 1L, 2L, 100L, 5000L, 5001L, 90000L, 90001L,
      500000L, 2000000L, 2000002L)
      .zipWithIndex.map { case (t, i) => (2L, "c2", t * 1000L, (100 + i).toLong) }
    val df = (timer ++ bursty).toDF("uid", "chan", "ts_us", "id")
    val out = Anomaly.beaconScores(df, "uid", "chan", "ts_us", "id", minGaps = 5)
      .select(col("uid"), col("cv_q"), col("is_beacon"))
      .as[(Long, Option[Long], Boolean)].collect()
      .map { case (k, v, b) => k -> ((v, b)) }.toMap
    assert(out(1L)._1.contains(0L) && out(1L)._2, s"timer not flagged: $out")
    assert(!out(2L)._2, s"bursty flagged: $out")
  }

  test("beaconScores: CV math exact on a hand-computed group") {
    // gaps 10, 20, 30: mean 20, pop var 200/3, cv = sqrt(200/3)/20
    val rows = Seq(0L, 10L, 30L, 60L).zipWithIndex
      .map { case (t, i) => (1L, "x", t, i.toLong) }
    val cv = Anomaly.beaconScores(rows.toDF("uid", "chan", "ts_us", "id"),
        "uid", "chan", "ts_us", "id", minGaps = 3)
      .select("cv_q").as[Long].head()
    val expected = math.floor(
      math.sqrt((100.0 + 400.0 + 900.0) / 3.0 - 400.0) / 20.0 * 1e6).toLong
    assert(cv === expected && cv === 408248L)
  }

  test("beaconScores: minGaps filters, all-zero gaps give NULL cv and no flag") {
    val few = (0 until 3).map(i => (1L, "a", i * 1000L, i.toLong))
    val zeros = (0 until 10).map(i => (2L, "a", 42L, (50 + i).toLong))
    val out = Anomaly.beaconScores((few ++ zeros).toDF("uid", "chan", "ts_us", "id"),
        "uid", "chan", "ts_us", "id", minGaps = 5)
      .select(col("uid"), col("cv_q"), col("is_beacon"))
      .as[(Long, Option[Long], Boolean)].collect()
    assert(out.length === 1)
    assert(out.head === ((2L, None, false)))
  }

  test("funnel: completion, strict ordering, and window anchoring") {
    val w = 1000000L // 1s window
    val ev = Seq(
      // u1 completes in order inside the window
      (1L, "a", 0L), (1L, "b", 10L), (1L, "c", 20L),
      // u2: step b ties step a's instant -> strict > blocks it
      (2L, "a", 0L), (2L, "b", 0L), (2L, "c", 5L),
      // u3: completes b, but c lands past the window anchored at FIRST a
      (3L, "a", 0L), (3L, "a", 999000L), (3L, "b", 500L), (3L, "c", 1000500L),
      // u4: steps out of order (c before b)
      (4L, "a", 0L), (4L, "c", 10L), (4L, "b", 20L),
      // u5: never starts
      (5L, "b", 0L), (5L, "c", 1L))
      .toDF("uid", "t", "tu")
    val out = Funnel.conversion(ev, "uid", "t", "tu", Seq("a", "b", "c"), w)
      .select("step_idx", "n_entities", "conv_q")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // starts: u1,u2,u3,u4 = 4; reach b: u1,u3,u4 = 3; reach c: u1 only
    // (u4's b at 20 is after its c at 10, but c must follow b: u4's c
    //  at 10 is NOT > t2=20, so u4 stops at b)
    assert(out(0) === ((1, 4L, 1000000L)))
    assert(out(1) === ((2, 3L, 750000L)))
    assert(out(2) === ((3, 1L, 250000L)))
  }

  test("markovPathScores: hand-computed transition surprise is exact") {
    // u1: a->b->a->b ; u2: a->a.  Model: a->b 2/3, a->a 1/3, b->a 1/1.
    val ev = Seq(
      (1L, "a", 0L, 0L), (1L, "b", 1L, 1L), (1L, "a", 2L, 2L), (1L, "b", 3L, 3L),
      (2L, "a", 0L, 4L), (2L, "a", 1L, 5L))
      .toDF("uid", "t", "ts_us", "id")
    val out = Anomaly.markovPathScores(ev, "uid", "t", "ts_us", "id")
      .orderBy("uid")
      .select("uid", "n_steps", "surprise_q", "avg_surprise_q")
      .as[(Long, Long, Long, Long)].collect()
    val c23 = math.floor(math.log(2.0 / 3.0) * 1e6).toLong // -405466
    val c13 = math.floor(math.log(1.0 / 3.0) * 1e6).toLong // -1098613
    assert(out(0) === ((1L, 3L, -2 * c23, (-2 * c23) / 3)))
    assert(out(1) === ((2L, 1L, -c13, -c13)))
    // the rare transition really is the more surprising one
    assert(out(1)._4 > out(0)._4)
  }

  test("theilSenSlopes: robust to the outlier day that destroys least squares") {
    // y = 2x exactly except one wild outlier at x=5
    val pts = Seq((0L, 0L), (1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L), (5L, 1000L))
      .map { case (x, y) => ("s", x, y) }
    val out = Anomaly.theilSenSlopes(pts.toDF("g", "x", "y"), "g", "x", "y")
      .select("n_pairs", "slope").as[(Long, Double)].head()
    assert(out._1 === 15L)
    assert(out._2 === 2.0, s"median slope dragged to ${out._2}")
    // negative trend comes out negative and exact
    val neg = Seq((0L, 9L), (1L, 6L), (2L, 3L), (3L, 0L))
      .map { case (x, y) => ("s", x, y) }
    assert(Anomaly.theilSenSlopes(neg.toDF("g", "x", "y"), "g", "x", "y")
      .select("slope").as[Double].head() === -3.0)
  }

  test("theilSenSlopes: an empty series yields an empty slope frame") {
    val out = Anomaly.theilSenSlopes(
      Seq.empty[(String, Long, Long)].toDF("g", "x", "y"), "g", "x", "y")
    assert(out.count() === 0L)
  }

  test("theilSenSlopes: maxPoints contract fails fast before the pair join") {
    val big = (0 until 50).map(i => ("g", i.toLong, i.toLong))
    val e = intercept[IllegalArgumentException] {
      Anomaly.theilSenSlopes(big.toDF("g", "x", "y"), "g", "x", "y",
        maxPoints = 10)
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("privacy: k-anonymity groups, risk summary, and l-diversity on a fixture") {
    import graft.ext.Privacy
    // quasi (city, age): one group of 5 (safe at k=5), one of 2, one of 1
    val rows = Seq.fill(5)(("nyc", 30, "flu")) ++
      Seq(("sfo", 40, "flu"), ("sfo", 40, "cold"), ("lax", 50, "rare"))
    val df = rows.toDF("city", "age", "dx")
    val groups = Privacy.kAnonymityGroups(df, Seq("city", "age"), 5)
      .as[(String, Int, Long, Boolean)].collect().toSet
    assert(groups === Set(("nyc", 30, 5L, false), ("sfo", 40, 2L, true),
      ("lax", 50, 1L, true)))
    val s = Privacy.kAnonymitySummary(df, Seq("city", "age"), 5)
      .select("n_groups", "n_violating", "rows_at_risk", "n_rows_total", "risk_pm")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(s === ((3L, 2L, 3L, 8L, 1000L * 3 / 8)))
    // l-diversity: nyc group has ONE distinct dx -> discloses it
    val ld = Privacy.lDiversityGroups(df, Seq("city", "age"), "dx", 2)
      .select("city", "n_sensitive", "is_violating")
      .as[(String, Long, Boolean)].collect().toSet
    assert(ld === Set(("nyc", 1L, true), ("sfo", 2L, false), ("lax", 1L, true)))
    assert(intercept[IllegalArgumentException] {
      Privacy.lDiversityGroups(df, Seq("dx"), "dx", 2)
    }.getMessage.contains("quasi"))
  }

  test("blockedEditJoin: brute-force parity within the block, no nested loop") {
    val catalog = Seq((1L, "alpha-001"), (2L, "alpho-001"), (3L, "beta-001"),
      (4L, "alpha-002"), (5L, "gamma-999")).toDF("id", "name")
    val probes = Seq((10L, "alpha-001"), (11L, "alphaX001"), (12L, "delta-999"))
      .toDF("pid", "pname")
    val blk = FuzzyJoin.suffixBlocker(3)
    val got = FuzzyJoin.blockedEditJoin(probes, "pname", catalog, "name",
        maxDist = 2, blocker = blk)
      .select("pid", "id", "dist").as[(Long, Long, Int)].collect().toSet
    // brute force restricted to the same blocking scheme
    val cat = catalog.as[(Long, String)].collect()
    val prb = probes.as[(Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (pid, pn) <- prb; (id, nm) <- cat
      if pn.takeRight(3).toLowerCase == nm.takeRight(3).toLowerCase
      d = lev(pn, nm) if d <= 2
    } yield (pid, id, d)).toSet
    assert(got === want && want.nonEmpty)
    // the plan is an equi-join on the block key, not a nested loop
    val plan = FuzzyJoin.blockedEditJoin(probes, "pname", catalog, "name",
      maxDist = 2, blocker = blk).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("multiBlockEditJoin: prefix ∪ suffix recovers every single deletion") {
    val names = (0 until 60).map(i => (i.toLong, f"entity-name-$i%04d"))
    val catalog = names.toDF("id", "name")
    // delete one char at a rotating position, INCLUDING head and tail
    val probes = names.map { case (i, n) =>
      val pos = (i % n.length).toInt
      (i, n.substring(0, pos) + n.substring(pos + 1))
    }.toDF("pid", "pname")
    val multi = FuzzyJoin.multiBlockEditJoin(probes, "pname", catalog, "name",
        maxDist = 1,
        Seq(FuzzyJoin.prefixBlocker(2), FuzzyJoin.suffixBlocker(3)))
      .where(col("pid") === col("id")).count()
    assert(multi === 60L, "a single deletion escaped both blockers")
    // a single blocker alone genuinely misses the head/tail edits
    val prefixOnly = FuzzyJoin.blockedEditJoin(probes, "pname", catalog, "name",
        maxDist = 1, blocker = FuzzyJoin.prefixBlocker(2))
      .where(col("pid") === col("id")).count()
    assert(prefixOnly < 60L)
    // distinct union: no pair is double-counted when both blockers match
    val all = FuzzyJoin.multiBlockEditJoin(probes, "pname", catalog, "name",
      maxDist = 1,
      Seq(FuzzyJoin.prefixBlocker(2), FuzzyJoin.suffixBlocker(3)))
    assert(all.count() === all.dropDuplicates("pid", "id").count())
  }

  test("blockedEditJoin: reserved column and blocker guards") {
    val df = Seq((1L, "x", "y")).toDF("id", "name", "_blk")
    val other = Seq((1L, "x")).toDF("id", "name")
    assert(intercept[IllegalArgumentException] {
      FuzzyJoin.blockedEditJoin(df, "name", other, "name")
    }.getMessage.contains("_blk"))
    assert(intercept[IllegalArgumentException] {
      FuzzyJoin.prefixBlocker(0)
    }.getMessage.contains("n >= 1"))
  }

  test("funnel: empty start yields zero conversions, not a crash") {
    val ev = Seq((1L, "x", 0L)).toDF("uid", "t", "tu")
    val out = Funnel.conversion(ev, "uid", "t", "tu", Seq("a", "b"), 100L)
      .select("n_entities", "conv_q").as[(Long, Long)].collect()
    assert(out.toSeq === Seq((0L, 0L), (0L, 0L)))
  }
  test("psiDrift: planted shift scores high, identical halves near zero") {
    import org.apache.spark.sql.functions._
    // snapshot 0 ~ low values, snapshot 1 ~ shifted high: PSI must cross
    // the industry 'shifted' threshold (0.25); a no-shift control stays
    // in the stable band (< 0.1)
    val shifted = ((1 to 400).map(i => ("feed", 0, (i % 50).toDouble)) ++
      (1 to 400).map(i => ("feed", 1, 50.0 + (i % 50))))
      .toDF("k", "snap", "v")
    val hi = Anomaly.psiDrift(shifted, "v", col("snap"), Seq("k"), bins = 10)
      .select("psi_q").as[Long].head()
    assert(hi > 250000000000L, s"shifted PSI ${hi / 1e12} not flagged")
    val same = ((1 to 400).map(i => ("feed", 0, (i % 50).toDouble)) ++
      (1 to 400).map(i => ("feed", 1, (i % 50).toDouble)))
      .toDF("k", "snap", "v")
    val lo = Anomaly.psiDrift(same, "v", col("snap"), Seq("k"), bins = 10)
      .select("psi_q").as[Long].head()
    assert(math.abs(lo) < 100000000000L, s"identical halves PSI ${lo / 1e12}")
    // missing bins densify: a snapshot missing entirely degrades to the
    // smoothed uniform rather than crashing or NaN-ing
    val oneSided = (1 to 100).map(i => ("feed", 0, (i % 10).toDouble))
      .toDF("k", "snap", "v")
    val os = Anomaly.psiDrift(oneSided, "v", col("snap"), Seq("k"))
      .select("n0", "n1", "psi_q").as[(Long, Long, Long)].head()
    assert(os._1 === 100L && os._2 === 0L)
    intercept[IllegalArgumentException](
      Anomaly.psiDrift(same, "v", col("snap"), Seq.empty))
    intercept[IllegalArgumentException](
      Anomaly.psiDrift(same, "v", col("snap"), Seq("k"), bins = 1))
  }
}
