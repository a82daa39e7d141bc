package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata alongside. The Spark-side contract
  * — schema, batch iteration shape, partition sizing — is real; the actual
  * media decoding is STUBBED (this container has no image/audio libraries)
  * behind a deterministic fake so the pipeline is testable end-to-end.
  *
  * Scale notes: payloads stay in executor memory only for the lifetime of
  * one `mapPartitions` batch; `spark.sql.files.maxPartitionBytes` bounds
  * the bytes per task, and feature extraction emits small fixed-size rows,
  * so the wide binary column is dropped as early as possible.
  */
object Multimodal {

  /** A decoded media feature row: fixed-size, no payload. */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      content_hash: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Input row shape for [[extractFeatures]] (public: Catalyst's generated
    * deserializer cannot access private classes).
    */
  case class MediaIn(media_id: Long, kind: String, payload: Array[Byte])

  /** STUB decoder — deterministic fake standing in for a real image/audio
    * decode (??? territory: a production build would call an imaging
    * library here). Derives plausible fixed dimensions from the payload
    * hash so downstream logic is exercised with stable values.
    */
  private def decodeStub(m: MediaIn): MediaFeatures = {
    // NULL payload (nullable BINARY per the schema contract) decodes as an
    // empty asset, not an executor-killing NPE mid-partition
    val bytes = if (m.payload == null) Array.emptyByteArray else m.payload
    val h = java.util.Arrays.hashCode(bytes).toLong & 0x7fffffffL
    MediaFeatures(
      media_id = m.media_id,
      kind = m.kind,
      n_bytes = bytes.length.toLong,
      content_hash = h,
      width = (h % 1920).toInt + 1,
      height = (h % 1080).toInt + 1,
      n_frames = if (m.kind == "video") (h % 300).toInt + 1 else 1)
  }

  /** Batch feature extraction over binary payloads: the `mapPartitions`
    * shape a real decoder plugs into — per-partition iteration, payloads
    * consumed streaming, small feature rows out.
    *
    * @param df columns: media_id LONG, kind STRING, payload BINARY
    */
  def extractFeatures(spark: SparkSession, df: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col("media_id").cast("long"), col("kind").cast("string"),
        col("payload").cast("binary"))
      .as[MediaIn]
      .mapPartitions(_.map(decodeStub))
  }

  /** Frame sampling plumbing for video payloads: emits one row per sampled
    * frame index (decode itself stubbed). Demonstrates the explode shape —
    * rows multiply, payload does not travel with them.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, everyN: Int): DataFrame = {
    require(everyN > 0, s"everyN must be positive, got $everyN")
    val feats = extractFeatures(spark, df)
    feats.toDF()
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)), lit(everyN))))
      .select("media_id", "kind", "frame_idx", "content_hash")
  }
}
