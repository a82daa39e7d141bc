package graft

import org.apache.spark.sql.functions._

/** Smoke + semantic checks for queries whose oracle is rows-only. */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("every declared query returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("approx distinct is within the configured HLL error of exact") {
    val r = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()(0)
    val approx = r.getAs[Long]("approx_users")
    val exact = r.getAs[Long]("exact_users")
    assert(math.abs(approx - exact).toDouble / exact <= 0.1,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile tracks the exact median per group") {
    val rows = SparkEntry.queries("q_approx_percentiles")(spark, dir)
      .select("approx_med", "exact_med").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    for ((approx, exact) <- rows) {
      // GK sketch with accuracy 1000 on ~2k-row groups: rank error <= ~0.1%;
      // assert a loose value-space bound so data drift doesn't flake
      assert(math.abs(approx - exact) <= math.max(1.0, math.abs(exact)) * 0.05,
        s"approx median $approx vs exact $exact")
    }
  }

  test("e2e throughput emits exactly one row per surviving event_id") {
    // event_id = l_orderkey*10 + l_linenumber COLLIDES (testdata lineitem
    // has duplicate (l_orderkey, l_linenumber) pairs), so keep-last dedup
    // legitimately emits fewer rows than the scan — pin that the output is
    // exactly one row per distinct surviving id, not a silent row loss.
    val out = SparkEntry.queries("q_e2e_throughput")(spark, dir)
    val n = out.count()
    val distinctIds = out.select("event_id").distinct().count()
    assert(n === distinctIds, s"$n rows vs $distinctIds distinct event_ids")
    val scanned = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(n > 0 && n < scanned)
  }

  test("entry() flagship returns the Q1 grouping") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows(0).schema.fieldNames.contains("sum_qty"))
  }
}
