package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star M5): media as opaque
  * `binary` columns with typed metadata, batch feature extraction via
  * mapPartitions.
  *
  * The image path is REAL as of round 5: [[attachImages]] synthesizes
  * deterministic PNGs (pixel content derived from document columns)
  * and [[extractImageFeatures]] decodes them with `javax.imageio`
  * (JDK built-in — PNG/BMP need no external codec), one reader reused
  * per partition. The oracle replays the pixel formulas on the stored
  * columns, so the encode→decode→measure loop is hash-checked end to
  * end. [[StubDecoder]] remains the seam for codecs the JDK lacks
  * (JPEG works too, but video/audio would slot in here).
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

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("mean_luma", DoubleType)))

  /** Synthesize a deterministic PNG per document: width/height/gray
    * levels are pure functions of (doc_id, n_chars), the top half is
    * gray `g = doc_id % 256` and the bottom half `(g + 64) % 256` —
    * so the DECODED dimensions and mean luma are SQL-expressible from
    * the stored columns and the whole encode→decode loop is
    * oracle-checkable. PNG is lossless, so pixel values survive
    * exactly.
    */
  def attachImages(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      val w = 1 + (nChars % 16).toInt
      val h = 1 + (docId % 12).toInt
      val g = (docId % 256).toInt
      val g2 = (g + 64) % 256
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        val v = if (y < (h + 1) / 2) g else g2
        val rgb = (v << 16) | (v << 8) | v
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    docs.select(
      col("doc_id"),
      mk(col("doc_id"), col("n_chars").cast("long")).as("media"),
      struct(
        lit("image/png").as("media_type"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))
  }

  /** Sniff the container from magic bytes — the dispatch a mixed
    * media column needs before choosing a reader.
    */
  def imageFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else throw new IllegalArgumentException(
      s"unsupported image container (${bytes.take(4).map(b => f"$b%02x").mkString(" ")})")

  /** REAL image decode via `javax.imageio`: dimensions + mean luma,
    * with ONE ImageReader per (partition, format) reused across rows —
    * the amortized-init batch shape a production codec needs; only the
    * input stream resets per row.
    *
    * Luma uses integer Rec.601 weights (299·R + 587·G + 114·B, summed
    * as a Long, divided by 1000·n at the end with exact decimal
    * rounding) so gray pixels contribute their gray level EXACTLY and
    * the oracle's rational arithmetic matches bit for bit.
    */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      val readers = scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
      def reader(fmt: String) = readers.getOrElseUpdate(fmt,
        javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())
      val out = it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val rd = reader(imageFormat(bytes))
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        rd.setInput(iis)
        val img = rd.read(0)
        iis.close()
        val w = img.getWidth
        val h = img.getHeight
        var s = 0L // Σ (299R + 587G + 114B) over pixels, exact
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            s += 299L * ((rgb >> 16) & 0xff) +
              587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = new java.math.BigDecimal(s)
          .divide(java.math.BigDecimal.valueOf(1000L * n), 6,
            java.math.RoundingMode.HALF_UP)
          .doubleValue()
        Row(id, w, h, n, mean)
      }
      out ++ { readers.values.foreach(_.dispose()); Iterator.empty }
    }
    spark.createDataFrame(rdd, imageFeatureSchema)
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
