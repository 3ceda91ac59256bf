package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star M5): media as opaque
  * `binary` columns with typed metadata, batch feature extraction via
  * mapPartitions.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is
  * real and tested; the actual byte decoder is STUBBED with a
  * deterministic fake (this container has no image/audio codecs; see
  * [[StubDecoder.decode]] for the seam a real codec would fill).
  */
object Multimodal {

  /** media metadata carried alongside the opaque bytes. */
  val metaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("declared_len", LongType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("first_byte", IntegerType),
    StructField("n_frames", LongType),
    StructField("mean_byte", DoubleType)))

  /** Attach an opaque binary media column + metadata struct to the
    * documents table (fixtures carry no real media; text bytes stand
    * in — the schema/partition/batch path is identical).
    */
  def attachMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("application/octet-stream").as("media_type"),
        length(col("text")).cast("long").as("declared_len")).as("meta"))

  /** The decoder seam. A real implementation would parse image/audio
    * frames here (per-partition, reusing codec state across rows —
    * that is the batch shape that matters at scale). The stub derives
    * deterministic pseudo-features from the raw bytes.
    */
  object StubDecoder {
    def decode(docId: Long, bytes: Array[Byte]): Row = {
      // STUB: stands in for e.g. JPEG decode + resize + frame-sample.
      val n = bytes.length.toLong
      val first = if (bytes.isEmpty) -1 else bytes(0) & 0xff
      val frames = n / 32 // fake "frame" every 32 bytes
      var s = 0L
      var i = 0
      while (i < bytes.length) { s += (bytes(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else s.toDouble / n
      // HALF_UP to match SQL round(): byte sums over power-of-two
      // lengths land on exact .xxxxx5 ties where rint (half-even)
      // would disagree
      val rounded = BigDecimal(mean)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      Row(docId, n, first, frames, rounded)
    }
  }

  /** Expression-level frame sampling: every `stride`-th fixed-size
    * byte window of the media column, as pure SQL expressions —
    * substring() on binary is codegen'd, so sampling never leaves
    * Tungsten and needs no UDF or decoder round-trip. Emits one row
    * per sampled frame: (doc_id, frame_no, frame, frame_len). The
    * real-codec analogue is keyframe extraction before the expensive
    * per-frame model pass; sampling first keeps that pass at 1/stride
    * of the data.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 32,
      stride: Int = 4): DataFrame =
    media
      .select(col("doc_id"), expr(
        s"""posexplode(transform(
           |  sequence(0, greatest(CAST(length(media) / $frameBytes AS INT) - 1, 0), $stride),
           |  i -> substring(media, i * $frameBytes + 1, $frameBytes)))"""
          .stripMargin))
      .select(col("doc_id"), col("pos").as("frame_no"),
        col("col").as("frame"), length(col("col")).cast("long").as("frame_len"))

  /** "Resize" stub: clamp media to `targetBytes` (the seam where a
    * real implementation re-encodes; the byte-budget semantics and
    * expression shape are what carry over).
    */
  def resizeMedia(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("media",
      substring(col("media"), 1, targetBytes))

  /** Batch feature extraction: one decoder instantiation per
    * partition, rows streamed through it — the mapPartitions shape a
    * real codec needs (amortized init, bounded memory).
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      // per-partition decoder init would go here
      it.map { r => StubDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
