package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Network
import graft.functions.{GraftFunctions, ZOrderFunctions, ZOrderImpl}

/** Network LPM enrichment and Z-order layout-key invariants. */
class NetworkSpec extends SparkSpec {
  import spark.implicits._

  private val feed = Seq(
    "0.0.0.0/2" -> "bogon-low",
    "10.0.0.0/8" -> "internal",
    "128.0.0.0/2" -> "botnet",
    "160.0.0.0/11" -> "tor-exit")

  test("cidr bounds: base address masks to the prefix, hi closes the block") {
    val out = spark.range(1).select(
      Network.cidrLo(lit("10.5.7.9/8")).as("lo"),
      Network.cidrHi(lit("10.5.7.9/8")).as("hi"),
      Network.cidrLo(lit("160.0.0.0/11")).as("lo11"),
      Network.cidrHi(lit("160.0.0.0/11")).as("hi11"))
      .as[(Long, Long, Long, Long)].head()
    assert(out._1 === 10L * 16777216)            // 10.0.0.0
    assert(out._2 === 11L * 16777216 - 1)        // 10.255.255.255
    assert(out._3 === 160L * 16777216)           // 160.0.0.0
    assert(out._4 === 160L * 16777216 + (1L << 21) - 1) // 160.31.255.255
  }

  test("lpm picks the longest matching prefix; uncovered addresses get NULL") {
    val ips = Seq(
      10L * 16777216 + 99,   // inside 10/8 AND 0/2 -> internal
      3L * 16777216,         // inside 0/2 only -> bogon-low
      160L * 16777216 + 5,   // inside 160/11 AND 128/2 -> tor-exit
      130L * 16777216,       // inside 128/2 only -> botnet
      100L * 16777216)       // 100.0.0.0 -> uncovered
    val df = ips.zipWithIndex.map { case (ip, i) => (i.toLong, ip) }.toDF("id", "ip")
    val got = Network.lpmEnrich(df, col("ip"), feed)
      .select(col("id"), col("_lpm.label").as("label"))
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      0L -> Some("internal"), 1L -> Some("bogon-low"),
      2L -> Some("tor-exit"), 3L -> Some("botnet"), 4L -> None))
  }

  test("every malformed feed entry fails with the descriptive CIDR message") {
    val df = Seq((1L, 1L)).toDF("id", "ip")
    for (bad <- Seq("10.0.0.0", "10.0.0/8", "10.0.0.x/8", "10.0.0.0/x",
        "10.0.0.0/33", "10.0.0.256/8", "10.0.0.0/8/2")) {
      val e = intercept[IllegalArgumentException] {
        Network.lpmEnrich(df, col("ip"), Seq(bad -> "label"))
      }
      assert(e.getMessage.contains(s"malformed CIDR: $bad"), s"for $bad: $e")
    }
  }

  test("lpmEnrich (literal array) and lpmJoin (broadcast range join) agree") {
    val df = (0 until 500)
      .map(i => (i.toLong, (i.toLong * 2654435761L) % (1L << 32)))
      .toDF("id", "ip")
    val viaArray = Network.lpmEnrich(df, col("ip"), feed)
      .where(col("_lpm").isNotNull)
      .select(col("id"), col("_lpm.cidr").as("cidr"), col("_lpm.prefix").as("prefix"))
      .as[(Long, String, Int)].collect().toSet
    val viaJoin = Network.lpmJoin(df, "id", col("ip"),
        feed.toDF("cidr", "label"))
      .select(col("id"), col("cidr"), col("prefix"))
      .as[(Long, String, Int)].collect().toSet
    assert(viaArray === viaJoin)
    assert(viaArray.nonEmpty)
  }

  test("lpmEnrich is map-side only: zero exchanges, inside whole-stage codegen") {
    val df = spark.range(100).select(col("id"),
      (col("id") * 7919L % (1L << 32)).as("ip"))
    val enriched = Network.lpmEnrich(df, col("ip"), feed)
      .where(col("_lpm").isNotNull)
    val plan = enriched.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"LPM enrichment must not shuffle the event side:\n$plan")
    // The match must stay a codegen'd when()-chain. The original
    // higher-order-function formulation (filter/aggregate lambdas) is
    // CodegenFallback — measured 26x slower at 10x scale — and would
    // show up here as a Project outside the WholeStageCodegen span
    // (explain marks codegen'd operators with '*').
    val formatted = enriched.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(formatted.contains("*(1) Project") || formatted.contains("*(1) Filter"),
      s"LPM projection fell out of whole-stage codegen:\n$formatted")
  }

  test("zorder16 matches the per-bit reference interleave") {
    def reference(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val cases = Seq[(Long, Long)](
      (0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
      (65536 + 7, 3), (0xABCD, 0x1234))
    for ((a, b) <- cases)
      assert(ZOrderImpl.interleave16(a, b) === reference(a & 0xFFFF, b & 0xFFFF),
        s"($a, $b)")
    // through the expression (codegen path), including null propagation
    val got = Seq((Some(12345L), Some(54321L)), (None, Some(1L)))
      .toDF("a", "b")
      .select(ZOrderFunctions.zorder16(col("a"), col("b")).as("z"))
      .as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(reference(12345, 54321)), None))
  }

  test("graft_zorder16 is callable from SQL after registration") {
    GraftFunctions.register(spark)
    val z = spark.sql("SELECT graft_zorder16(3, 1) AS z").as[Long].head()
    // a=3 -> bits 0,2 set; b=1 -> bit 1 set
    assert(z === (1L | (1L << 2) | (1L << 1)))
  }

  test("z-order layout skips files on a secondary-dimension slab; single-column sort cannot") {
    // 256x256 (user, day) grid. 16 files per layout. A day-only slab
    // covers 1/16 of the day range: the user-sorted layout leaves every
    // file's day min/max spanning the full range (0 files skippable),
    // while Z-order files are quad-tree blocks, tight in BOTH dimensions.
    val grid = spark.range(256L * 256)
      .select((col("id") / 256).cast("long").as("user"),
        (col("id") % 256).cast("long").as("day"))
      .withColumn("zkey", ZOrderFunctions.zorder16(col("user"), col("day")))
    val root = Files.createTempDirectory("graft-zorder").toString

    grid.repartitionByRange(16, col("zkey")).sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$root/zorder")
    grid.repartitionByRange(16, col("user")).sortWithinPartitions("user")
      .write.mode("overwrite").parquet(s"$root/bycol")

    def overlapping(path: String, lo: Long, hi: Long): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("day").as("dmin"), max("day").as("dmax"))
      (stats.where(col("dmax") >= lo && col("dmin") <= hi).count(), stats.count())
    }
    val (zHit, zTotal) = overlapping(s"$root/zorder", 100, 115)
    val (cHit, cTotal) = overlapping(s"$root/bycol", 100, 115)
    assert(zTotal === 16 && cTotal === 16)
    // day slab 100..115 has day bits b7=0, b6=1 fixed -> at most ~1/4 of
    // the 16 top-level Morton blocks (+ boundary straddle) can contain it
    assert(zHit <= 6, s"z-order layout should bound the slab, hit $zHit/16")
    assert(cHit === 16, s"user-sorted layout cannot prune a day slab, hit $cHit/16")
  }

  test("binnedRangeJoin matches the naive BETWEEN join on every bin geometry") {
    // Points on a small lattice; intervals of assorted widths including
    // zero-width, bin-straddling, bin-aligned, and full-space.
    val pts = (0L until 400L).map(i => (i, (i * 2654435761L) % 4096))
      .toDF("pid", "pt")
    val ivs = Seq(
      (1L, 0L, 0L),        // zero width at the origin
      (2L, 100L, 163L),    // inside one 64-wide bin
      (3L, 60L, 70L),      // straddles the 64-boundary
      (4L, 128L, 191L),    // exactly bin-aligned
      (5L, 0L, 4095L),     // full space
      (6L, 4090L, 4095L))  // tail bin
      .toDF("iid", "lo", "hi")
    val got = Network.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binBits = 6)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = pts.join(ivs, col("pt").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
    // A point lives in exactly one bin: no duplicate pairs possible.
    val n = Network.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binBits = 6)
      .select("pid", "iid").count()
    assert(n === want.size.toLong)
  }

  test("binnedRangeJoin plans an equi-join on the bin, never a nested loop") {
    val pts = spark.range(1000).select(col("id").as("pid"),
      (col("id") * 7 % 100000).as("pt"))
    val ivs = spark.range(1000).select(col("id").as("iid"),
      (col("id") * 97 % 100000).as("lo"))
      .withColumn("hi", col("lo") + 50)
    val plan = Network.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binBits = 6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
    // The bare BETWEEN join on the same frames IS a nested loop — the
    // rewrite is what buys the equi-join shape.
    val bare = pts.join(ivs, col("pt").between(col("lo"), col("hi")))
      .queryExecution.executedPlan.toString
    assert(bare.contains("BroadcastNestedLoopJoin") || bare.contains("CartesianProduct"))
  }

  test("binnedRangeJoin rejects a reserved _bin column") {
    val pts = Seq((1L, 2L)).toDF("pt", "_bin")
    val ivs = Seq((0L, 10L)).toDF("lo", "hi")
    val e = intercept[IllegalArgumentException] {
      Network.binnedRangeJoin(pts, "pt", ivs, "lo", "hi", binBits = 4)
    }
    assert(e.getMessage.contains("_bin"))
  }
}
