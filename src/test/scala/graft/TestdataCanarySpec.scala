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

  test("documents schema carries the columns and types the suite assumes") {
    // The text/dedup/sampling families read these columns by name with
    // fixed type expectations (doc_id long ids in generated md5/xxh64
    // oracles; text string for the tokenizer mirrors; lang/source string
    // group keys; n_tokens/quality numeric). A driver regeneration that
    // re-types any of them must fail HERE by name — the r8 ts lesson,
    // applied to the text tables before it happens to them.
    assume(have("documents"), s"$sfDir/documents.parquet not present")
    import org.apache.spark.sql.types._
    val sch = QueryDef.table(spark, sfDir, "documents").schema
    def has(name: String, ok: DataType => Boolean): Unit = {
      assert(sch.fieldNames.contains(name),
        s"documents.$name missing — observed schema: ${sch.treeString}")
      assert(ok(sch(name).dataType),
        s"documents.$name re-typed to ${sch(name).dataType} — adapt the " +
          s"consumers (QueryDef-style named adapter) before trusting the " +
          s"gate. Observed schema: ${sch.treeString}")
    }
    has("doc_id", _ == LongType)
    has("text", _ == StringType)
    has("lang", _ == StringType)
    has("source", _ == StringType)
  }

  test("embeddings schema and vector shape match the ANN/dedup assumptions") {
    // The ANN family hard-assumes: vec_id long (the XXH64 hashLong sample
    // replay hashes an 8-byte integer), embedding array<float> (float→
    // double upcast exactness + the DECIMAL(18,5) VARCHAR-hop parity in
    // the fixed-point quantizer oracles), constant dimension divisible by
    // the PQ m=8 (subspace slicing), and |v| small enough that scaled
    // elements fit the documented integer headroom. A regeneration that
    // widens floats to double, re-types vec_id, or changes dim must fail
    // HERE by name, not as 10 opaque ANN hash mismatches.
    assume(have("embeddings"), s"$sfDir/embeddings.parquet not present")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = QueryDef.table(spark, sfDir, "embeddings")
    val sch = df.schema
    assert(sch("vec_id").dataType == LongType,
      s"embeddings.vec_id re-typed: ${sch.treeString}")
    assert(sch("embedding").dataType == ArrayType(FloatType, containsNull = true)
        || sch("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding re-typed (hashLong/DECIMAL oracle parity " +
        s"breaks on non-float32): ${sch.treeString}")
    val stats = df.where(col("embedding").isNotNull)
      .select(min(size(col("embedding"))).as("dmin"),
        max(size(col("embedding"))).as("dmax"),
        max(aggregate(col("embedding"), lit(0.0d),
          (a, x) => greatest(a, abs(x.cast("double"))))).as("vmax"))
      .collect()(0)
    assert(stats.getInt(0) == stats.getInt(1),
      s"embedding dimension is ragged (${stats.getInt(0)}..${stats.getInt(1)})")
    assert(stats.getInt(0) % 8 == 0,
      s"embedding dim ${stats.getInt(0)} not divisible by PQ m=8 subspaces")
    assert(stats.getDouble(2) < 100.0,
      s"max |element| ${stats.getDouble(2)} exceeds the scaled-integer " +
        "headroom the fixed-point quantizer oracles assume (|v|·10^5 per " +
        "element, documented in Similarity)")
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

  test("documents.source labels match the derivation conventions (r11)") {
    // q_domain_pagerank derives edge targets as 'src' || (doc_id*31+7)%20
    // and the DSIR queries anchor the target domain at source = 'src1';
    // a driver-side regeneration that renames or resizes the source
    // universe must fail HERE by name, not as an opaque hash mismatch
    assume(have("documents"), s"$sfDir/documents.parquet not present")
    import org.apache.spark.sql.functions._
    val srcs = QueryDef.table(spark, sfDir, "documents")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(srcs.forall(_.matches("src\\d+")),
      s"unexpected source labels: ${srcs.filterNot(_.matches("src\\d+"))}")
    assert(srcs == (0 until 20).map(i => s"src$i").toSet,
      s"source universe changed (${srcs.size} labels) - the pagerank " +
        "edge derivation (% 20) and the DSIR src1 target anchor in " +
        "UrlQueries/ExtensionQueries need re-pinning")
  }
}
