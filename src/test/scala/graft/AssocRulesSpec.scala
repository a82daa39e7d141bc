package graft

import graft.ext.AssocRules

/** Hand-computed rule metrics, Apriori pruning, duplicate collapse, and
  * the quadratic-stage guard.
  */
class AssocRulesSpec extends SparkSpec {
  import spark.implicits._

  test("pair metrics match the hand computation") {
    // 4 baskets: {a,b}, {a,b}, {a,c}, {b}
    val bi = Seq(
      ("b1", "a"), ("b1", "b"),
      ("b2", "a"), ("b2", "b"),
      ("b3", "a"), ("b3", "c"),
      ("b4", "b")).toDF("bk", "it")
    val out = AssocRules.pairRules(bi, "bk", "it", minSupport = 2)
      .select("i1", "i2", "n12", "n1", "n2", "n_baskets",
        "support_q", "conf12_q", "conf21_q", "lift")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().toSeq
    // only (a,b) survives: n12=2; (a,c) has n12=1 < minSupport and c
    // itself is infrequent (1 basket) so the Apriori prune drops it first
    assert(out === Seq(
      ("a", "b", 2L, 3L, 3L, 4L, 500000L, 666666L, 666666L, 2.0 * 4 / 9)))
  }

  test("item multiplicity within a basket collapses to presence") {
    val bi = Seq(
      ("b1", "a"), ("b1", "a"), ("b1", "b"),
      ("b2", "a"), ("b2", "b"), ("b2", "b")).toDF("bk", "it")
    val out = AssocRules.pairRules(bi, "bk", "it", minSupport = 2)
      .select("n12", "n1", "n2").as[(Long, Long, Long)].collect().toSeq
    assert(out === Seq((2L, 2L, 2L)))
  }

  test("the fat-basket guard fails fast before the quadratic stage") {
    val fat = (0 until 60).map(i => ("b1", s"i$i")) ++
      (0 until 60).map(i => ("b2", s"i$i"))
    val e = intercept[IllegalArgumentException] {
      AssocRules.pairRules(fat.toDF("bk", "it"), "bk", "it",
        minSupport = 2, maxFrequentPerBasket = 50)
    }
    assert(e.getMessage.contains("quadratic"))
  }

  test("parameter guards") {
    val bi = Seq(("b1", "a")).toDF("bk", "it")
    intercept[IllegalArgumentException](
      AssocRules.pairRules(bi, "bk", "it", minSupport = 0))
    intercept[IllegalArgumentException](
      AssocRules.pairRules(bi, "bk", "it", 2, maxFrequentPerBasket = 1))
  }
}
