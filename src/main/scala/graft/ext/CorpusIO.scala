package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) corpus interchange — the format every
  * public crawl dump, instruction-tuning set, and eval suite ships in.
  * The scan SEMANTICS (inference, escaping, nested fields) are pinned by
  * the `q_scan_jsonl` gate query; this is the production I/O surface
  * around them.
  */
object CorpusIO {

  /** Write a frame as .jsonl. Deterministic per row: field order is the
    * schema's column order, one object per line.
    *
    * Nulls are kept EXPLICIT (`"f": null`, not absent) — corpus
    * interchange breaks silently when half the shards drop a field and
    * downstream inference types them differently; an explicit null keeps
    * every line's shape identical. `compression` "gzip"/"zstd" for
    * shipping, "none" for local work. `partitionCols` shards the corpus
    * by e.g. source or language — at 100 TB the writer then lays files
    * out for partition-pruned reads, and no shuffle is introduced here
    * (partitionBy splits the existing task outputs).
    */
  def writeJsonl(
      df: DataFrame, path: String,
      compression: String = "none",
      partitionCols: Seq[String] = Nil,
      singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    val w = out.write
      .option("ignoreNullFields", "false")
      .option("compression", compression)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .json(path)
  }

  /** Read .jsonl with an EXPLICIT schema — the production path. Schema
    * inference is a separate full pass over the data (Spark reads every
    * file once just to infer); on a 100 TB corpus that doubles the scan,
    * so inference belongs in exploration (`spark.read.json(path)`), not
    * pipelines. Corrupt lines land in `_corrupt_record` when the schema
    * declares it (PERMISSIVE default) instead of failing the job — the
    * crawl-scale reality is that some shard somewhere is truncated.
    */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write one opaque payload file per row — the shard layout multimodal
    * corpora arrive in (an image/audio blob per key, keyed by filename).
    * Executors write their partitions directly (no driver collect); at
    * cluster scale `dir` is shared storage, and the write parallelism is
    * the frame's partitioning. Filenames are `<id>.<ext>` — the id must
    * be filename-safe.
    *
    * Contract (advice r10, now ENFORCED): ids must be distinct and
    * non-NULL — two rows sharing an id would race on the same
    * `<id>.<ext>` path with a nondeterministic last-writer-wins across
    * partitions — and payloads must be non-NULL. Ids are checked by one
    * id-only aggregation BEFORE any file is written (column-pruned:
    * payload bytes are not read twice); a NULL payload fails the task
    * with the offending id in the message instead of a bare NPE.
    */
  def writeBinaryShards(
      df: DataFrame, id: String, payload: String,
      dir: String, ext: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import org.apache.spark.sql.functions.{col, count, countDistinct, lit}
    val src = df.select(col(id).cast("string").as("_id"),
      col(payload).cast("binary").as("_p"))
    val chk = src.agg(count(lit(1)).as("n"), count(col("_id")).as("nn"),
      countDistinct(col("_id")).as("nd")).collect()(0)
    require(chk.getLong(1) == chk.getLong(0),
      s"writeBinaryShards: ${chk.getLong(0) - chk.getLong(1)} NULL ids " +
        "(every row needs a filename)")
    require(chk.getLong(2) == chk.getLong(0),
      s"writeBinaryShards: ids are not distinct (${chk.getLong(0)} rows, " +
        s"${chk.getLong(2)} distinct ids) — duplicate rows would race on " +
        "the same shard path")
    src.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          require(bytes != null,
            s"writeBinaryShards: NULL payload for id '${r.getString(0)}'")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"${r.getString(0)}.$ext"), bytes)
        }
      }
  }

  /** Scan a directory of opaque shards via Spark's built-in `binaryFile`
    * source: (shard_id parsed from the filename, length, content).
    * `glob` prunes at FILE LISTING time (`pathGlobFilter`) — a corpus
    * directory mixing .png/.wav/.json shards never reads the bytes of
    * the formats a job doesn't want, which at 100 TB is the difference
    * between listing metadata and scanning the corpus.
    *
    * Zero-byte shards yield NO row (the file source packs splits by
    * length and an empty file has none) — truncated-to-empty shards
    * must be caught by count reconciliation, not content checks.
    */
  def readBinaryShards(
      spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)\\.[^./]+$", 1).as("shard_id"),
        col("length"), col("content"))
  }
}
