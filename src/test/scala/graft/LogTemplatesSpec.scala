package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ext.LogTemplates
import graft.streaming.StreamingPipeline

/** Masking-order contracts, census semantics, the novelty window, and
  * the first-seen streaming twin.
  */
class LogTemplatesSpec extends SparkSpec {
  import spark.implicits._

  private def tpl(s: String): String =
    Seq(s).toDF("m").select(LogTemplates.templateOf(col("m"))).head().getString(0)

  test("masking order: UUID before HEX, IP before NUM, HEX before NUM") {
    // a UUID must stay ONE placeholder, not shatter into hex runs
    assert(tpl("sid 01234567-89ab-cdef-0123-456789abcdef end")
      === "sid <UUID> end")
    // an IPv4 must not dissolve into four numbers
    assert(tpl("from 10.123.4.250 port 443") === "from <IP> port <NUM>")
    // an all-digit 12-char run is a hex-shaped token, not a number
    assert(tpl("trace 123456789012 code 17") === "trace <HEX> code <NUM>")
    assert(tpl("trace deadbeef1234 ok") === "trace <HEX> ok")
    // short hex-ish words survive (no 8-char run)
    assert(tpl("feed me beef") === "feed me beef")
    assert(tpl("user 42 did 7 things") === "user <NUM> did <NUM> things")
  }

  test("mine: census counts, sightings, and deterministic example") {
    val rows = Seq(
      ("user 1 login", 100L), ("user 2 login", 300L), ("user 3 login", 200L),
      ("disk full on /dev/sda1", 150L))
    val out = LogTemplates.mine(rows.toDF("msg", "tu"), "msg", "tu")
      .orderBy("template")
      .as[(String, Long, Long, Long, String)].collect().toSeq
    assert(out === Seq(
      ("disk full on /dev/sda<NUM>", 1L, 150L, 150L, "disk full on /dev/sda1"),
      ("user <NUM> login", 3L, 100L, 300L, "user 1 login")))
  }

  test("novelTemplates flags only templates first seen in the trailing window") {
    // range [0, 1000]; cutoff at 800 for lastFracInv = 5
    val rows = Seq(
      ("user 1 login", 0L), ("user 2 login", 1000L), // spans -> not novel
      ("kernel panic code 7", 850L), // first seen late -> novel
      ("old alarm 3", 700L)) // before the cutoff -> not novel
    val out = LogTemplates.novelTemplates(
        rows.toDF("msg", "tu"), "msg", "tu", lastFracInv = 5)
      .select("template").as[String].collect().toSeq
    assert(out === Seq("kernel panic code <NUM>"))
  }

  test("novel template stream: one alert per template, at first arrival") {
    implicit val sqlCtx = spark.sqlContext
    def ts(ms: Long) = new Timestamp(ms)
    val input = MemoryStream[(String, Timestamp, Long, String)]
    val q = StreamingPipeline.novelTemplateStream(
        input.toDF().toDF("template", "timestamp", "event_id", "message"))
      .writeStream.outputMode("append")
      .format("memory").queryName("tpl_out").start()
    try {
      input.addData(
        ("user <NUM> login", ts(100), 1L, "user 1 login"),
        ("user <NUM> login", ts(50), 2L, "user 2 login"),
        ("ERR <NUM>", ts(200), 3L, "ERR 9"))
      q.processAllAvailable()
      // batch 2: an old template re-appears (no re-alert), a new one lands
      input.addData(
        ("user <NUM> login", ts(300), 4L, "user 4 login"),
        ("breach at <IP>", ts(400), 5L, "breach at 10.0.0.1"))
      q.processAllAvailable()
      val got = spark.table("tpl_out")
        .select("template", "event_id").as[(String, Long)].collect().toSet
      // one row per template; within batch 1 the login alert carries the
      // earliest (event-time, id) row
      assert(got === Set(
        ("user <NUM> login", 2L), ("ERR <NUM>", 3L), ("breach at <IP>", 5L)))
      // parity: emitted template set == batch distinct templates
      assert(got.map(_._1) ===
        Set("user <NUM> login", "ERR <NUM>", "breach at <IP>"))
    } finally q.stop()
  }
  test("uppercase hex runs and Windows-style GUIDs are masked (advice r14)") {
    assert(tpl("trace DEADBEEF01 done") == "trace <HEX> done")
    assert(tpl("guid {A1B2C3D4-E5F6-0718-293A-4B5C6D7E8F90} ok")
      == "guid {<UUID>} ok")
    assert(tpl("mixed AbCdEf1234 run") == "mixed <HEX> run")
    // an 0x prefix glues onto the run (no word boundary), so the run
    // itself is not hex-masked; the digits still collapse to <NUM>
    assert(tpl("raw 0xAbCdEf1234") == "raw <NUM>xAbCdEf<NUM>")
    // short hex-range WORDS stay words (the documented trade)
    assert(tpl("efface accede") == "efface accede")
  }
}
