package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.LongType

import graft.queries.QueryDef

/** Schema-drift canary against the driver-generated testdata.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * shipped two `ts` encodings (TIMESTAMP(NANOS) read as LongType nanos,
  * then µs TIMESTAMP_NTZ — the r8 regression: 76 queries failed ANALYSIS
  * with no in-repo signal). This suite fails loudly, with the observed
  * schema in the message, the moment `QueryDef.eventsTable` can no longer
  * normalize the current testdata — so a future re-encoding costs one red
  * test instead of 76 silent gate absences.
  */
class TestdataCanarySpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  private def have(name: String): Boolean =
    Files.exists(Paths.get(s"$sfDir/$name.parquet"))

  test("eventsTable analyzes and executes against the live testdata") {
    assume(have("events"), s"$sfDir/events.parquet not present")
    val rawType = spark.read.parquet(s"$sfDir/events.parquet")
      .schema("ts").dataType
    val ev =
      try QueryDef.eventsTable(spark, sfDir)
      catch {
        case e: Throwable =>
          fail(
            s"eventsTable failed on the live testdata (raw ts: $rawType) — " +
              s"the driver likely re-encoded ts again; extend " +
              s"QueryDef.eventsTable. Cause: ${e.getMessage}")
      }
    assert(ev.schema("ts").dataType == LongType,
      s"eventsTable must normalize ts to epoch-nanos LongType (raw: $rawType)")
    // One full execution (not just analysis): ordering by the normalized
    // ts exercises the cast end-to-end.
    val row = ev.selectExpr("ts", "event_id").orderBy("ts", "event_id")
      .limit(1).collect()
    assert(row.length == 1, "events testdata is unexpectedly empty")
    // Sanity-bound the normalized epoch-nanos: 2000-01-01..2100-01-01.
    // A wrong unit (µs kept as-is, or a double cast) lands outside this
    // window by 3+ orders of magnitude.
    val ns = row(0).getLong(0)
    assert(ns > 946684800L * 1000000000L && ns < 4102444800L * 1000000000L,
      s"normalized ts=$ns ns is outside 2000..2100 — unit conversion drifted")
  }

  test("all testdata tables referenced by the suite are readable") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val missing = tables.filterNot(have)
    assert(missing.isEmpty, s"testdata tables missing: $missing")
    for (t <- tables)
      assert(QueryDef.table(spark, sfDir, t).limit(1).count() == 1L,
        s"$t.parquet is empty or unreadable")
  }

  test("documents corpus is printable ASCII (generated-oracle assumption)") {
    // Several generated DuckDB oracles assume char == byte and reserve
    // chr(31) as a delimiter: the winnow replay (XXH64 over the UTF-8
    // BYTES of 8-CHAR grams), the BPE merge rewrite, and the minhash
    // tokenizer mirror. All hold on printable-ASCII text and can silently
    // diverge otherwise — so a driver-side corpus regeneration that
    // introduces non-ASCII (or chr(31)) must fail HERE, by name, not as
    // an unexplained oracle hash mismatch.
    assume(have("documents"), s"$sfDir/documents.parquet not present")
    import org.apache.spark.sql.functions._
    val offenders = QueryDef.table(spark, sfDir, "documents")
      .where(col("text").isNotNull &&
        !col("text").rlike("^[\\x20-\\x7e]*$"))
      .count()
    assert(offenders == 0L,
      s"$offenders documents contain non-printable-ASCII text - revisit " +
        "the char==byte / chr(31)-delimiter assumptions in the winnow, " +
        "BPE, and minhash oracles (ExtensionQueries) before trusting the " +
        "gate")
  }
}
