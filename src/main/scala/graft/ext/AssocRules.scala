package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining over baskets (Agrawal & Srikant
  * 1994's Apriori, restricted to the 2-itemset level that covers the
  * overwhelming share of production rule mining): which items co-occur
  * more than chance — the cross-sell signal in product analytics, the
  * "these two alerts fire together" signal in a SOC.
  *
  * Scale shape, in order:
  *  1. basket–item pairs dedupe (presence, not multiplicity — the
  *     standard basket model), one shuffle on (basket, item);
  *  2. item supports + the APRIORI PRUNE: only items with
  *     `support >= minSupport` can appear in a frequent pair, so
  *     infrequent items never reach the pairing stage;
  *  3. a bounded-fan-out guard: the pair stage is quadratic IN THE
  *     BASKET, so a basket carrying more than `maxFrequentPerBasket`
  *     frequent items fails fast (the [[graft.etl.Anomaly.theilSenSlopes]]
  *     guard pattern) instead of silently planning n² work;
  *  4. within-basket self-join on the basket key (i1 < i2) + a pair
  *     support filter;
  *  5. metrics: support/confidence as EXACT fixed-point integer ratios
  *     (floor(10⁶·a/b) — engine-replayable), lift as a fixed-shape
  *     double expression tree (identical-operand casts and one
  *     multiply per side — deterministic cross-engine).
  */
object AssocRules {

  /** @param df        one row per (basket, item) observation; duplicates
    *                  collapse
    * @param basket    basket id column
    * @param item      item column
    * @param minSupport minimum number of baskets for an item AND for a
    *                  pair to be reported
    */
  def pairRules(
      df: DataFrame, basket: String, item: String, minSupport: Long,
      maxFrequentPerBasket: Int = 256): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxFrequentPerBasket >= 2,
      s"maxFrequentPerBasket must be >= 2, got $maxFrequentPerBasket")
    val bi = df.select(col(basket).as("_b"), col(item).as("_i"))
      .where(col("_b").isNotNull && col("_i").isNotNull)
      .distinct()
      .localCheckpoint(true) // item counts + both pairing sides
    val nBaskets = bi.select(countDistinct(col("_b")).as("_n"))
    val itemCounts = bi.groupBy("_i").agg(count(lit(1)).as("_ni"))
      .where(col("_ni") >= minSupport)
      .localCheckpoint(true) // prune join + two metric joins
    val frequent = bi.join(itemCounts.select("_i"), "_i")
      .localCheckpoint(true) // guard count + both pair sides
    val fattest = frequent.groupBy("_b").agg(count(lit(1)).as("_k"))
      .agg(coalesce(max(col("_k")), lit(0L))).head().getLong(0)
    require(fattest <= maxFrequentPerBasket,
      s"pairRules: a basket holds $fattest frequent items " +
        s"(> maxFrequentPerBasket=$maxFrequentPerBasket) — the pair stage " +
        "is quadratic per basket; raise minSupport or cap the baskets first")
    val pairs = frequent.as("l")
      .join(frequent.as("r"),
        col("l._b") === col("r._b") && col("l._i") < col("r._i"))
      .groupBy(col("l._i").as("i1"), col("r._i").as("i2"))
      .agg(count(lit(1)).as("n12"))
      .where(col("n12") >= minSupport)
    pairs
      .join(itemCounts.select(col("_i").as("i1"), col("_ni").as("n1")), "i1")
      .join(itemCounts.select(col("_i").as("i2"), col("_ni").as("n2")), "i2")
      .crossJoin(broadcast(nBaskets))
      .select(col("i1"), col("i2"), col("n12"), col("n1"), col("n2"),
        col("_n").as("n_baskets"),
        expr("1000000 * n12 div _n").as("support_q"),
        expr("1000000 * n12 div n1").as("conf12_q"),
        expr("1000000 * n12 div n2").as("conf21_q"),
        ((col("n12").cast("double") * col("_n").cast("double")) /
          (col("n1").cast("double") * col("n2").cast("double"))).as("lift"))
  }
}
