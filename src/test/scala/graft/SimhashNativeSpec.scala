package graft

import org.apache.spark.sql.functions._

/** Bit-equivalence of the native one-pass simhash60 expression
  * (optimization r20) against both legacy forms it replaces: the
  * explode + 60-conditional-sum aggregate (the old simhashTable) and
  * the interpreted Column fold (Dedup.simhash64). The fingerprint
  * feeds every simhash dedup gate's banding, so a drift here would
  * break five oracle hashes — this spec localizes the fault.
  */
class SimhashNativeSpec extends SparkSpec {
  import spark.implicits._

  /** The legacy explode+aggregate form, reconstructed inline. */
  private def legacyTable(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Long] = {
    val md5Hash60 = (c: org.apache.spark.sql.Column) =>
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    val hashed = df.select(col("doc_id"),
        explode(array_distinct(graft.ext.TextAnalysis.tokens(col("text"))))
          .as("tok"))
      .withColumn("h", md5Hash60(col("tok")))
    val bitSums = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"b$i")
    }
    val agg = hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sim = (0 until 60).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a + b)
    agg.select(col("doc_id"), sim.as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("native simhash60 equals the legacy aggregate on the live corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val native = graft.ext.Dedup.simhashTable(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val legacy = legacyTable(docs)
    assert(native === legacy)
    assert(native.nonEmpty)
  }

  test("whitespace / empty-token / unicode edges match both legacy forms") {
    val edge = Seq(
      (1L, "plain words here"),
      (2L, "  leading and trailing  "),
      (3L, "\ttab-led text"), // trim strips 0x20 only -> leading "" token
      (4L, "multi   space nbsp"),
      (5L, ""),
      (6L, "répé日本 mixed ünïcode"),
      (7L, "dup dup dup unique")).toDF("doc_id", "text")
    val native = graft.ext.Dedup.simhashTable(edge, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === legacyTable(edge))
    // the interpreted Column fold agrees too
    val folded = edge.select(col("doc_id"),
        graft.ext.Dedup.simhash64(col("text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === folded)
    // NULL text emits no row (the explode contract)
    val withNull = Seq((8L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(graft.ext.Dedup.simhashTable(withNull, "doc_id", "text").isEmpty)
  }
}
