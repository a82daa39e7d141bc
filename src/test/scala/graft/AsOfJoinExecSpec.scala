package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins
import graft.plans.AsOfJoin

/** The custom whole-operator as-of join (LogicalPlan + Strategy +
  * SparkPlan) against the composed window form and hand-checked fixtures.
  */
class AsOfJoinExecSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def events = graft.queries.QueryDef.eventsTable(spark, dir)

  test("asofJoinExec equals the window-form asofJoin on real event data") {
    val e = events.select("event_id", "user_id", "ts")
    def marks = events
      .filter(col("event_id") % 10 === 0)
      .groupBy("user_id", "ts")
      .agg(min(col("value")).as("mark_value"))

    val viaExec = AsOfJoin.asofJoinExec(e, marks, "user_id", "ts", "ts")
      .select("event_id", "mark_value").orderBy("event_id").collect()
    val viaWindow = TemporalJoins.asofJoin(e, marks, "user_id", "ts", "ts")
      .select("event_id", "mark_value").orderBy("event_id").collect()
    assert(viaExec.length > 0)
    assert(viaExec.toSeq == viaWindow.toSeq)
  }

  test("physical plan: AsOfJoinExec node, one exchange + one sort per side") {
    val e = events.select("event_id", "user_id", "ts")
    val marks = events.filter(col("event_id") % 10 === 0)
      .groupBy("user_id", "ts").agg(min(col("value")).as("mark_value"))
    val df = AsOfJoin.asofJoinExec(e, marks, "user_id", "ts", "ts")
    df.collect() // finalize the adaptive plan
    // executedPlan under AQE wraps the final plan; assert on the final one
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the "Exec" suffix — the node prints as "AsOfJoin"
    // (AQE keeps the inner plan out of the TreeNode children, so the audit
    // is on the rendered final plan, like the other plan specs)
    assert(plan.contains("AsOfJoin "), plan.take(3000))
    // both children must be clustered on the key and sorted by (key, time):
    // EnsureRequirements inserts the exchanges + sorts around the exec
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan.take(3000))
    assert("Sort \\[".r.findAllIn(plan).size >= 2, plan.take(3000))
  }

  test("NULL keys and times: left emits null payload, right rows are ignored") {
    import spark.implicits._
    val left = Seq(
      (1L, Option("u1"), Option(10L)),
      (2L, None: Option[String], Option(10L)),  // null key -> no match
      (3L, Option("u1"), None: Option[Long]),   // null time -> no match
      (4L, Option("u3"), Option(10L))           // only null-key right rows for u3
    ).toDF("id", "k", "t")
    val right = Seq(
      (Option("u1"), Option(5L), "a"),
      (None: Option[String], Option(1L), "nullkey"), // never a match
      (Option("u3"), None: Option[Long], "nulltime") // never a match
    ).toDF("k", "rt", "v")

    val got = AsOfJoin.asofJoinExec(left, right, "k", "t", "rt")
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq(
      (1L, Some("a")), (2L, None), (3L, None), (4L, None)))
  }

  test("ties at equal (key, time) pick the largest payload tuple — same as window form") {
    import spark.implicits._
    val left = Seq(("u1", 10L, 1L)).toDF("k", "t", "id")
    val right = Seq(
      ("u1", 10L, "low", 1L), ("u1", 10L, "zzz", 9L), ("u1", 10L, "mid", 5L)
    ).toDF("k", "rt", "tag", "rank")

    val exec = AsOfJoin.asofJoinExec(left, right, "k", "t", "rt")
      .select("id", "tag", "rank").collect().toSeq
    val win = TemporalJoins.asofJoin(left, right, "k", "t", "rt")
      .select("id", "tag", "rank").collect().toSeq
    assert(exec == win)
    assert(exec.head.getString(1) == "zzz") // struct-max: largest tuple wins
  }

  test("inclusive match at equal timestamps; strictly-later right rows excluded") {
    import spark.implicits._
    val left = Seq(("u1", 10L, 1L), ("u1", 3L, 2L)).toDF("k", "t", "id")
    val right = Seq(("u1", 10L, "at10"), ("u1", 11L, "at11"), ("u1", 4L, "at4"))
      .toDF("k", "rt", "v")
    val got = AsOfJoin.asofJoinExec(left, right, "k", "t", "rt")
      .select("id", "v").orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    // id=1 at t=10: latest right <= 10 is at10 (inclusive); id=2 at t=3: none
    assert(got == Seq((1L, Some("at10")), (2L, None)))
  }

  test("self-join from the SAME DataFrame instance re-aliases conflicting exprIds") {
    import spark.implicits._
    val df = Seq(("u1", 1L, 7L), ("u1", 5L, 8L)).toDF("k", "t", "x")
    val right = df.select(col("k"), col("t").as("rt"), (col("x") * 10).as("y"))
    val got = AsOfJoin.asofJoinExec(df, right, "k", "t", "rt")
      .select("t", "y").orderBy("t").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 70L), (5L, 80L)))
  }

  test("strategy registration is idempotent") {
    AsOfJoin.ensureRegistered(spark)
    AsOfJoin.ensureRegistered(spark)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.AsOfJoinStrategy) == 1)
  }
}
