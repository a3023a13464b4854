package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.9): media as opaque binary
  * payloads + typed metadata, processed per-partition.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake; everything around it — schema,
  * batch shape, partition-wise execution, metadata pushdown — is the
  * real Spark plumbing a decode UDF would run in. Swap `decodeStub`
  * for a real codec (JNI/Pandas-UDF) and nothing else changes.
  */
object Multimodal {

  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Synthesize a media table from documents: payload = utf8 bytes of
    * the text (stand-in for image bytes), metadata derived
    * deterministically. Pure projection.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        element_at(array(lit("jpg"), lit("png"), lit("webp")), (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(100) + col("doc_id") % 400).cast("int").as("width"),
        (lit(100) + col("doc_id") % 300).cast("int").as("height")).as("meta"))

  /** STUB — deterministic fake decoder: real implementation would
    * decode image bytes to pixels (e.g. via a Pandas UDF over
    * mapInPandas with PIL/libvips). Here: an 8-dim "feature vector"
    * from byte sums over 8 stripes of the payload. Keeps the exact
    * batch shape (binary in, fixed-width float vector out).
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val k = 8
    val out = new Array[Float](k)
    if (payload.nonEmpty) {
      val stripe = math.max(1, payload.length / k)
      var i = 0
      while (i < payload.length) {
        out(math.min(i / stripe, k - 1)) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }

  /** Deterministic frame-index sampling for "video" payloads: frame
    * count derived from payload size (stand-in for container metadata),
    * every `step`-th frame index emitted as a row — the explode shape a
    * real frame sampler produces (one row per sampled frame, metadata
    * carried along). Pure projection + explode; no shuffle.
    */
  def sampleFrameIndices(media: DataFrame, bytesPerFrame: Int, step: Int): DataFrame =
    media
      .withColumn("n_frames", greatest(lit(1), (length(col("payload")) / bytesPerFrame).cast("int")))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1, lit(step))))
      .select(col("media_id"), col("meta.format").as("format"), col("n_frames"), col("frame_idx"))

  /** Partition-wise feature extraction: the decode runs inside
    * mapPartitions (per-executor, no driver involvement), preserving
    * partitioning. This is the seat a real codec would occupy.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("format", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    media.select(col("media_id"), col("meta.format").as("format"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("format"),
            payload.length, decodeStub(payload))
        }
      }(encoder)
  }
}
