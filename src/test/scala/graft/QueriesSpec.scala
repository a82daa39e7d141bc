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

  test("no codegen fallback anywhere: every query fully materializes " +
      "with spark.sql.codegen.fallback=false") {
    // count() lets Catalyst PRUNE unconsumed projections, so a janino
    // blowup in a derived column can hide from the rows>0 test. The noop
    // sink consumes every output column, and the shared session runs with
    // codegen fallback disabled (SparkSpec) — any generated code that
    // stops compiling throws here instead of silently running interpreted
    // (the r14 URL-family defect, gated forever).
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(s"query $name: ") {
        fn(spark, dir).write.format("noop").mode("overwrite").save()
      }
    }
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("declared query names are unique (no silent .toMap shadowing)") {
    // allDefs itself requires uniqueness; pin that the map loses nothing.
    assert(SparkEntry.allDefs.size === SparkEntry.queries.size)
    assert(SparkEntry.queries.contains("q_funnel") &&
      SparkEntry.queries.contains("q_funnel_steps"))
  }

  test("approx distinct is within the configured HLL error of exact") {
    val r = SparkEntry.queries("q_approx_distinct")(spark, dir).collect()(0)
    val approx = r.getAs[Long]("approx_users")
    val exact = r.getAs[Long]("exact_users")
    assert(math.abs(approx - exact).toDouble / exact <= 0.1,
      s"approx $approx vs exact $exact")
  }

  test("approx percentile tracks the exact median per group") {
    val approx = SparkEntry.queries("q_approx_percentiles")(spark, dir)
      .select("event_type", "approx_med").as[(String, Double)].collect().toMap
    // exact medians computed HERE, independent of the benched sketch query
    val exactRows = SparkEntry.queries("q_percentiles")(spark, dir)
      .select("event_type", "med").as[(String, Double)].collect().toMap
    assert(approx.nonEmpty && approx.keySet === exactRows.keySet)
    for ((etype, a) <- approx) {
      val exact = exactRows(etype)
      // accuracy=100 -> ~1% rank error; near-uniform values make rank and
      // value error comparable, so a 5% value bound holds with margin
      assert(math.abs(a - exact) <= math.max(1.0, math.abs(exact)) * 0.05,
        s"$etype: approx median $a vs exact $exact")
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
