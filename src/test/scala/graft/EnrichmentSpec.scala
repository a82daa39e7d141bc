package graft

import org.apache.spark.sql.functions._

import graft.queries.EnrichmentQueries

/** Mathematical invariants of the enrichment analytics — properties the
  * DuckDB oracle cannot express (it only replays the same computation).
  */
class EnrichmentSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("transition probabilities sum to 1 within each source type") {
    val sums = EnrichmentQueries.qEventTransitions.fn(spark, dir)
      .groupBy("event_type").agg(sum("p").as("s"))
      .select("s").as[Double].collect()
    assert(sums.nonEmpty)
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s"sum $s"))
  }

  test("equi-depth bins are balanced and ordered; counts cover all non-null rows") {
    val bins = EnrichmentQueries.qBinEquidepth.fn(spark, dir)
      .as[(Int, Long, Double, Double)].collect()
    assert(bins.map(_._1).toSeq === Seq(1, 2, 3, 4))
    val total = bins.map(_._2).sum
    val nonNull = spark.read.parquet(s"$dir/events.parquet")
      .where(col("value").isNotNull).count()
    assert(total === nonNull)
    // quartiles: each bin within 1 row of total/4 (exact interpolated cuts)
    bins.foreach(b => assert(math.abs(b._2 - total / 4.0) <= 1.0, b.toString))
    // bins are contiguous: max of bin k <= min of bin k+1
    bins.sliding(2).foreach { case Array(a, b) => assert(a._4 <= b._3) }
  }

  test("CUSUM returns to zero at each type's final day") {
    val last = EnrichmentQueries.qCusumDaily.fn(spark, dir)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy(col("day").desc)))
      .where(col("rk") === 1)
      .select("cusum").as[Double].collect()
    assert(last.nonEmpty)
    // run_D*D - D*T = 0 exactly: the deviation series telescopes
    last.foreach(c => assert(c === 0.0, s"final cusum $c"))
  }

  test("percent_rank spans [0, 1] with 0 and 1 attained per type") {
    val pr = EnrichmentQueries.qPercentRank.fn(spark, dir)
      .groupBy("event_type").agg(min("pr").as("lo"), max("pr").as("hi"))
      .as[(String, Double, Double)].collect()
    assert(pr.nonEmpty)
    pr.foreach { case (t, lo, hi) =>
      assert(lo === 0.0 && hi === 1.0, s"$t: [$lo, $hi]")
    }
  }

  test("histogram covers all non-null rows; weekday shares sum to 1") {
    val hist = EnrichmentQueries.qHistEquiwidth.fn(spark, dir)
      .select("n_rows").as[Long].collect()
    val nonNull = spark.read.parquet(s"$dir/events.parquet")
      .where(col("value").isNotNull).count()
    assert(hist.sum === nonNull)
    val shares = EnrichmentQueries.qWeekdayProfile.fn(spark, dir)
      .groupBy("dow").agg(sum("share").as("s")).select("s").as[Double].collect()
    assert(shares.length === 7)
    shares.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
  }

  test("association lift is consistent with independent-frequency expectation") {
    val rows = EnrichmentQueries.qAssocPairs.fn(spark, dir)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, n, lift) =>
      assert(a < b, "pairs are canonically ordered")
      assert(n >= 1 && lift > 0.0)
    }
    // lift must not be constant — the data has co-occurrence structure
    assert(rows.map(_._4).distinct.length > 1)
  }

  test("drift report halves partition the stream exactly") {
    val r = EnrichmentQueries.qDriftReport.fn(spark, dir)
      .agg(sum(col("n_first") + col("n_second"))).as[Long].head()
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(r === total)
  }

  test("session paths: top-path count equals the user-days sharing that path") {
    val top = EnrichmentQueries.qSessionPaths.fn(spark, dir)
      .as[(String, Long)].collect()
    assert(top.length === 20)
    // ranked descending with path tiebreak
    top.sliding(2).foreach { case Array(x, y) =>
      assert(x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    }
  }

  test("count-min never under-estimates; each sketch row conserves total mass") {
    val est = EnrichmentQueries.qCountMin.fn(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(est.nonEmpty)
    est.foreach { case (u, t, e) => assert(e >= t, s"user $u: est $e < true $t") }
    val e = spark.read.parquet(s"$dir/events.parquet")
    // a deliberately narrow sketch (8 buckets over these keys) must both
    // collide somewhere AND keep every estimate an upper bound
    val narrowSketch = graft.ext.Sketches
      .countMinSketch(e, col("user_id"), width = 8, depth = 2)
    val narrowTruth = e.where(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n_true"))
    val narrow = graft.ext.Sketches
      .countMinLookup(narrowSketch, narrowTruth, col("user_id"), width = 8, depth = 2)
      .as[(Long, Long, Long)].collect()
    narrow.foreach { case (u, t, o) => assert(o >= t, s"user $u") }
    assert(narrow.exists { case (_, t, o) => o > t },
      "no collision — width too wide to exercise CMS")
    val total = e.where(col("user_id").isNotNull).count()
    val rowMass = graft.ext.Sketches
      .countMinSketch(e, col("user_id"), width = 64, depth = 4)
      .groupBy("j").agg(sum("c").as("mass"))
      .select("mass").as[Long].collect()
    assert(rowMass.length === 4)
    rowMass.foreach(m => assert(m === total))
  }

  test("count-min with a wide sketch is exact on this key space") {
    val e = spark.read.parquet(s"$dir/events.parquet")
    val sketch = graft.ext.Sketches
      .countMinSketch(e, col("user_id"), width = 4096, depth = 4)
    val truth = e.where(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n_true"))
    val out = graft.ext.Sketches
      .countMinLookup(sketch, truth, col("user_id"), width = 4096, depth = 4)
      .as[(Long, Long, Long)].collect()
    out.foreach { case (u, t, est) => assert(est === t, s"user $u") }
  }

  test("gini matches a plain-Scala reference on the per-user counts and lies in [0,1)") {
    val counts = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val sorted = counts.sortBy { case (u, n) => (n, u) }.map(_._2)
    val n = sorted.length.toLong
    val t = sorted.sum
    val s = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val ref = (2 * s - (n + 1) * t).toDouble / (n * t).toDouble
    val got = EnrichmentQueries.qGini.fn(spark, dir)
      .as[(Long, Long, Double)].head()
    assert(got._1 === n && got._2 === t)
    assert(got._3 === ref, s"gini ${got._3} != reference $ref")
    assert(got._3 >= 0.0 && got._3 < 1.0)
  }

  test("benford digits are 1-9, counts cover the table, shares sum to 1") {
    val rows = EnrichmentQueries.qBenford.fn(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).forall(d => d.length == 1 && d >= "1" && d <= "9"))
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(rows.map(_._2).sum === total)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-9)
  }

  test("pareto frontier equals the brute-force skyline") {
    val pts = spark.read.parquet(s"$dir/events.parquet")
      .where(col("user_id").isNotNull && col("value").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("x"), max(col("value")).as("y"))
      .as[(Long, Long, Double)].collect()
    val expected = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }.toSet
    val got = EnrichmentQueries.qParetoFront.fn(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(got === expected)
    assert(got.size >= 2, "frontier should exhibit a real tradeoff")
  }

  test("count-min sketches merge relationally: union+sum equals the whole-corpus sketch") {
    val e = spark.read.parquet(s"$dir/events.parquet")
    def sk(df: org.apache.spark.sql.DataFrame) = graft.ext.Sketches
      .countMinSketch(df, col("user_id"), width = 32, depth = 3)
    val whole = sk(e).as[(Int, Long, Long)].collect().toSet
    val merged = sk(e.where(col("event_id") % 2 === 0))
      .union(sk(e.where(col("event_id") % 2 =!= 0)))
      .groupBy("j", "bucket").agg(sum("c").as("c"))
      .as[(Int, Long, Long)].collect().toSet
    assert(merged === whole)
  }

  test("entry/exit transition table partitions the user-days and the events exactly") {
    val r = EnrichmentQueries.qEntryExit.fn(spark, dir)
      .agg(sum("n_days"), sum("n_events")).as[(Long, Long)].head()
    val e = graft.queries.QueryDef.eventsTable(spark, dir)
      .where(col("user_id").isNotNull)
    val userDays = e.select(col("user_id"), expr("ts div 86400000000000"))
      .distinct().count()
    assert(r._1 === userDays)
    assert(r._2 === e.count())
  }

  test("gap percentiles are ordered p50 <= p90 <= p99 and positive") {
    val rows = EnrichmentQueries.qGapPercentiles.fn(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, n, p50, p90, p99) =>
      assert(n > 0 && p50 > 0 && p50 <= p90 && p90 <= p99, s"$t: $p50/$p90/$p99")
    }
  }

  test("pricing summary pushes the ship-date filter; large orders aggregates BEFORE joining") {
    val p1 = EnrichmentQueries.qPricingSummary.fn(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p1.contains("PushedFilters") && p1.contains("l_shipdate"),
      "ship-date filter must reach the lineitem scan")
    // the HAVING aggregate must sit BELOW the joins (fact collapse first):
    // some Aggregate subtree in the optimized plan contains no Join
    val opt = EnrichmentQueries.qLargeOrders.fn(spark, dir)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val aggs = opt.collect { case a: Aggregate => a }
    assert(aggs.exists(a => a.collect { case j: Join => j }.isEmpty),
      "expected a pre-join aggregate over the bare fact table")
  }

  test("star revenue plans broadcast joins for the dimensions and pushes the date filter") {
    val df = EnrichmentQueries.qStarRevenue.fn(spark, dir)
    assert(df.count() >= 1)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast dimension joins")
    assert(plan.contains("PushedFilters") && plan.contains("o_orderdate"),
      "expected the date filter pushed into the orders scan")
  }
}
