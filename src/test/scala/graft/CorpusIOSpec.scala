package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ext.CorpusIO

/** JSONL corpus interchange: deterministic write shape, explicit-schema
  * read, corrupt-line tolerance, partitioned layout. The scan semantics
  * themselves (inference, escaping, nesting) are gate-checked by
  * q_scan_jsonl; this spec pins the I/O surface contracts.
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  private def docsSlice = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("doc_id") < 50)
    .select(col("doc_id"), col("text"), col("lang"),
      (col("doc_id").cast("double") / 4.0).as("score"),
      when(pmod(col("doc_id"), lit(3)) =!= 0,
        concat(lit("x"), col("doc_id"))).as("extra"))

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete(); d.getAbsolutePath
  }

  test("jsonl round-trip with explicit schema is lossless; nulls stay explicit") {
    val src = docsSlice
    val path = tmpDir("jsonl_rt")
    CorpusIO.writeJsonl(src, path, singleFile = true)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("score", DoubleType),
      StructField("extra", StringType)))
    val back = CorpusIO.readJsonl(spark, path, schema)
    val a = src.orderBy("doc_id").collect().map(_.toSeq)
    val b = back.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // the explicit-null contract: a doc_id % 3 == 0 line must CONTAIN
    // "extra":null — absent fields are the silent schema-drift mode this
    // writer rejects
    val lines = spark.read.text(path).as[String].collect()
    assert(lines.exists(_.contains("\"extra\":null")),
      "null field was dropped from the serialized object")
    // deterministic field order = schema order
    assert(lines.forall(_.startsWith("{\"doc_id\":")))
  }

  test("corrupt lines land in _corrupt_record instead of failing the read") {
    val path = tmpDir("jsonl_corrupt")
    CorpusIO.writeJsonl(docsSlice, path, singleFile = true)
    // a shard truncated mid-object — the crawl-scale reality (written as
    // its own file: appending to a Spark-written part file would only
    // trip the Hadoop .crc sidecar, not the JSON parser)
    val fw = new java.io.FileWriter(new java.io.File(path, "shard-bad.json"))
    fw.write("{\"doc_id\": 999, \"text\": \"trunca")
    fw.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("_corrupt_record", StringType)))
    val back = CorpusIO.readJsonl(spark, path, schema).cache()
    try {
      assert(back.filter(col("_corrupt_record").isNotNull).count() === 1L)
      assert(back.filter(col("_corrupt_record").isNull).count() ===
        docsSlice.count())
    } finally { back.unpersist(); () }
  }

  test("partitioned write lays out lang= directories and reads back losslessly") {
    val path = tmpDir("jsonl_part")
    CorpusIO.writeJsonl(docsSlice, path, partitionCols = Seq("lang"))
    val langDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(langDirs.nonEmpty, "no lang= partition directories")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("score", DoubleType), StructField("extra", StringType)))
    val back = CorpusIO.readJsonl(spark, path, schema)
    // partition column comes back from the directory layout
    assert(back.columns.contains("lang"))
    val a = docsSlice.select("doc_id", "lang", "score").orderBy("doc_id")
      .collect().map(_.toSeq)
    val b = back.select("doc_id", "lang", "score").orderBy("doc_id")
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("binary shards: executor write, glob-pruned listing, id round-trip") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binio_").toString
    val payloads = Seq(
      (7L, Array[Byte](1, 2, 3)),
      (8L, Array[Byte](9)),
      (9L, Array.empty[Byte])).toDF("doc_id", "payload") // 9 is EMPTY
    CorpusIO.writeBinaryShards(payloads, "doc_id", "payload", dir, "bin")
    // a shard of another format that the glob must never read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "junk.json"), "{}".getBytes)
    val got = CorpusIO.readBinaryShards(spark, dir, "*.bin")
      .orderBy("shard_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getAs[Array[Byte]](2).toSeq))
    // zero-byte shards yield NO row (documented source behavior): the
    // file source packs splits by length and an empty file has none
    assert(got.toSeq == Seq(
      ("7", 3L, Seq[Byte](1, 2, 3)),
      ("8", 1L, Seq[Byte](9))))
  }

  test("binary shards: duplicate/NULL ids and NULL payloads fail fast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_binio_g_").toString
    val dup = Seq((7L, Array[Byte](1)), (7L, Array[Byte](2)))
      .toDF("doc_id", "payload")
    val e1 = intercept[IllegalArgumentException] {
      CorpusIO.writeBinaryShards(dup, "doc_id", "payload", dir, "bin")
    }
    assert(e1.getMessage.contains("not distinct"), e1.getMessage)
    // the duplicate check ran BEFORE any file was written
    assert(!java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().hasNext, "fail-fast wrote shards anyway")
    val nullId = Seq((Option.empty[Long], Array[Byte](1)))
      .toDF("doc_id", "payload")
    val e2 = intercept[IllegalArgumentException] {
      CorpusIO.writeBinaryShards(nullId, "doc_id", "payload", dir, "bin")
    }
    assert(e2.getMessage.contains("NULL ids"), e2.getMessage)
    val nullPayload = Seq((7L, Option.empty[Array[Byte]]))
      .toDF("doc_id", "payload")
    val e3 = intercept[Exception] {
      CorpusIO.writeBinaryShards(nullPayload, "doc_id", "payload", dir, "bin")
    }
    assert(e3.getMessage.contains("NULL payload") ||
      Option(e3.getCause).exists(_.getMessage.contains("NULL payload")),
      e3.getMessage)
  }
}
