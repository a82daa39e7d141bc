package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.EventSchema

/** Source readers with the engine's ingest conventions: header'd CSV (the
  * reference's input format — reference: src/pipeline.py:20), parquet, and
  * JSON-lines, each optionally stamped with `_ingest_order` so the
  * order-dependent keep-last dedup is well-defined downstream
  * (SURVEY.md §1.5).
  *
  * Scale notes: `monotonically_increasing_id` is (partition << 33 | row) —
  * monotone with file order when each file maps to one split; multi-split
  * files or globs need an explicit order column in the data itself, which
  * is why `withIngestOrder` is a visible knob and not a silent default for
  * every reader.
  */
object Sources {

  def csv(spark: SparkSession, path: String,
      withIngestOrder: Boolean = true,
      inferSchema: Boolean = true): DataFrame =
    stamp(spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .csv(path), withIngestOrder)

  def parquet(spark: SparkSession, path: String,
      withIngestOrder: Boolean = false): DataFrame =
    stamp(spark.read.parquet(path), withIngestOrder)

  /** JSON-lines (one object per line) — the common raw-event feed shape. */
  def jsonLines(spark: SparkSession, path: String,
      withIngestOrder: Boolean = true): DataFrame =
    stamp(spark.read.json(path), withIngestOrder)

  /** Schema-pinned JSONL reader: at 100 TB the inference pass of
    * [[jsonLines]] is a full extra scan of the corpus (and can widen types
    * on dirty lines) — production reads pin the schema.
    */
  def jsonLinesWithSchema(
      spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      withIngestOrder: Boolean = false): DataFrame =
    stamp(spark.read.schema(schema).json(path), withIngestOrder)

  /** JSON-Lines sink — the interchange format LLM corpus tooling expects
    * (one object per line; writers shard one file per partition, so the
    * export parallelizes like any other sink). NULL fields are omitted per
    * line and come back as NULLs under a schema-pinned read.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC scan — the other columnar interchange format large pipelines
    * exchange data in. Spark's ORC reader is vectorized and supports the
    * same predicate pushdown + column pruning as parquet, so ORC inputs
    * ride the identical scan-level optimizations.
    */
  def orc(spark: SparkSession, path: String,
      withIngestOrder: Boolean = false): DataFrame =
    stamp(spark.read.orc(path), withIngestOrder)

  /** ORC sink — one file per partition, parallel like any columnar
    * writer. Types round-trip losslessly for every testdata column class
    * (int64, double, string, binary, list<float>); `q_orc_roundtrip`
    * pins that with a hash-match against the original parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  private def stamp(df: DataFrame, withIngestOrder: Boolean): DataFrame =
    if (withIngestOrder)
      df.withColumn(EventSchema.ingestOrderCol, monotonically_increasing_id())
    else df

  /** CSV sink matching the reference's output conventions (header, single
    * file, reference timestamp rendering — reference: src/pipeline.py:50-51).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ssxxx")
      .mode("overwrite")
      .csv(path)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCol`. Readers filtering on the partition column prune whole
    * directories at planning time (`PartitionFilters` in the scan) —
    * at 100 TB, partitioning by ingestion day is the first-order lever for
    * time-ranged queries. Keep partition cardinality moderate (days, not
    * user ids): each value is a directory + files.
    */
  def writePartitioned(
      df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.partitionBy(partitionCol).mode("overwrite").parquet(path)

  /** Persist a table bucketed + sorted on a join key. Two tables bucketed
    * the same way join WITHOUT any exchange — the 100 TB strategy for
    * repeated large-large joins (e.g. events ⋈ user dimensions on
    * user_id): pay one shuffle at write time, join shuffle-free forever
    * after. Verified by ScaleFeaturesSpec (no Exchange in the join plan).
    */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, buckets: Int = 32): Unit =
    // Repartition on the bucket key FIRST: bucketBy writes one file per
    // (writer task × bucket present in it), so an N-partition input
    // yields up to N files per bucket — measured in r19 as a ~3 s
    // constant on EVERY scan of a 141-bucket serving table (4.5k file
    // opens). HashPartitioning(key, buckets) is the same Murmur3 layout
    // bucketBy uses, so after this shuffle each task holds exactly one
    // bucket → exactly one file per bucket.
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
}
