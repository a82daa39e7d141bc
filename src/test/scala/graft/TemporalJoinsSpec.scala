package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** As-of and range joins verified against brute-force formulations. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("as-of join attaches the latest prior value per key, inclusive at ties") {
    val events = Seq(
      ("u", 100L, 1L), ("u", 205L, 2L), ("u", 300L, 3L),
      ("v", 150L, 4L), ("w", 50L, 5L))
      .toDF("user_id", "t", "event_id")
    val quotes = Seq(
      ("u", 90L, 1.0), ("u", 205L, 2.0), ("u", 250L, 3.0),
      ("v", 10L, 4.0), ("v", 160L, 5.0))
      .toDF("user_id", "qt", "price")

    val got = TemporalJoins.asofJoin(events, quotes, "user_id", "t", "qt")
      .select("event_id", "price").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(got(1L) === Some(1.0)) // t=100 -> quote at 90
    assert(got(2L) === Some(2.0)) // t=205 -> quote AT 205 (inclusive)
    assert(got(3L) === Some(3.0)) // t=300 -> quote at 250
    assert(got(4L) === Some(4.0)) // t=150 -> v's quote at 10 (160 is later)
    assert(got(5L) === None)      // w has no quotes

    // brute force cross-check on the same data
    val brute = events.as("e").join(quotes.as("q"),
        $"e.user_id" === $"q.user_id" && $"q.qt" <= $"e.t", "left")
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_id").orderBy(col("qt").desc_nulls_last)))
      .filter(col("rn") === 1)
      .select("event_id", "price").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got === brute)
  }

  test("as-of join preserves genuine NULLs and never stitches right rows") {
    val events = Seq(("u", 300L, 1L)).toDF("user_id", "t", "event_id")
    // latest right row (qt=200) has a=NULL, b=2; earlier row has a=1, b=NULL.
    // The correct as-of result is THAT row's values (NULL, 2) — not the
    // cross-row stitch (1, 2), and not a stale (1, NULL).
    val quotes = Seq(
      ("u", 100L, Some(1.0), None: Option[Double]),
      ("u", 200L, None: Option[Double], Some(2.0)))
      .toDF("user_id", "qt", "a", "b")
    val r = TemporalJoins.asofJoin(events, quotes, "user_id", "t", "qt").collect()(0)
    assert(r.isNullAt(r.fieldIndex("a")), "genuine NULL must not be back-filled")
    assert(r.getDouble(r.fieldIndex("b")) === 2.0)
  }

  test("binned range join is exact at epoch-nanosecond magnitudes") {
    // values ~1.7e18 exceed double's 2^53 integer precision: double-divide
    // binning mis-bins boundary points; integer `div` binning must not.
    val base = 1700000000000000000L
    val points = (0 until 400).map(i => ("k", base + i * 997L, i.toLong))
      .toDF("key", "t", "pid")
    val intervals = (0 until 40).map(i =>
      ("k", base + i * 10000L, base + i * 10000L + 1500L, i.toLong))
      .toDF("key", "lo", "hi", "iid")
    val got = TemporalJoins.rangeJoinBinned(points, "t", intervals, "lo", "hi",
        "key", binWidth = 4096)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("key"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("binned range join equals the naive theta join") {
    val points = (1 to 200).map(i => ("k" + i % 3, i * 7L, i.toLong))
      .toDF("key", "t", "pid")
    val intervals = (1 to 30).map(i => ("k" + i % 3, i * 40L, i * 40L + 55L, i.toLong))
      .toDF("key", "lo", "hi", "iid")

    val got = TemporalJoins.rangeJoinBinned(points, "t", intervals, "lo", "hi",
        "key", binWidth = 64)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("key"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("guards: zero binWidth and column collisions fail loudly") {
    val l = Seq(("k", 1L, 1L)).toDF("key", "t", "pid")
    val r = Seq(("k", 0L, 5L, 1L)).toDF("key", "lo", "hi", "iid")
    val e1 = intercept[IllegalArgumentException] {
      TemporalJoins.rangeJoinBinned(l, "t", r, "lo", "hi", "key", binWidth = 0)
    }
    assert(e1.getMessage.contains("binWidth"))

    val le = Seq(("u", 1L, 1L)).toDF("user_id", "t", "event_id")
    val re = Seq(("u", 1L, 9L)).toDF("user_id", "qt", "event_id") // collides
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.asofJoin(le, re, "user_id", "t", "qt")
    }
    assert(e2.getMessage.contains("event_id"))
  }

  test("as-of join plan uses a single per-key exchange (no pair blowup)") {
    val events = Seq(("u", 100L, 1L)).toDF("user_id", "t", "event_id")
    val quotes = Seq(("u", 90L, 1.0)).toDF("user_id", "qt", "price")
    val df = TemporalJoins.asofJoin(events, quotes, "user_id", "t", "qt")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not contain a join node:\n${plan.take(1200)}")
  }
}
