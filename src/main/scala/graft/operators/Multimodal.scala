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
  * (JDK built-in — PNG/BMP/JPEG/GIF need no external codec), one
  * reader reused per (partition, format). Round 7 adds JPEG + GIF:
  * [[attachImagesMixed]] emits a mixed-container corpus and the
  * magic-byte sniff dispatches the reader. The oracle replays the
  * pixel formulas on the stored columns, so the
  * encode→decode→measure loop is hash-checked end to end.
  * [[StubDecoder]] remains the seam for codecs the JDK lacks
  * (video/audio would slot in here).
  */
object Multimodal {

  /** javax.imageio defaults to DISK-backed stream caches: every
    * createImage{Input,Output}Stream (including the ones ImageIO.write
    * wraps around a ByteArrayOutputStream) spills through a temp FILE.
    * Harmless-ish single-threaded; with the codec stages now spread
    * over all cores it serializes 32 tasks on temp-file churn (measured
    * 0.9 s -> 10.9 s on q_multimodal_mixed). Rows here are KB-sized —
    * memory-backed streams are strictly better. Called at each codec
    * seam so the flag is set in whatever JVM runs the task.
    */
  private def noImageDiskCache(): Unit =
    if (javax.imageio.ImageIO.getUseCache) javax.imageio.ImageIO.setUseCache(false)

  /** Encode/decode are the CPU term of every multimodal operator and
    * the fixture scan plans one task (single-row-group parquet) —
    * spread before the codec UDF; a no-op when the scan already yields
    * >= parallelism splits (ScaleOps.spread).
    */
  private def spreadDocs(docs: DataFrame): DataFrame =
    ScaleOps.spread(docs, Seq(col("doc_id")))

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

  /** Two-band grayscale test pattern: top half gray `g`, bottom half
    * `(g + 64) % 256` — the shape whose decoded mean luma is
    * SQL-expressible from (doc_id, n_chars).
    */
  private def bandedRgbImage(w: Int, h: Int, g: Int): java.awt.image.BufferedImage = {
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
    img
  }

  /** Uniform-gray grayscale JPEG at compression quality 1.0. With an
    * all-ones quantization table a constant block's DCT is DC-only, so
    * the decode is raster-exact for every gray level (probed over all
    * 256 levels × 6 sizes) — which is what lets a LOSSY container
    * carry an exact oracle.
    */
  def encodeJpegGray(w: Int, h: Int, g: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.getRaster.setSample(x, y, 0, g); x += 1 }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

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
      noImageDiskCache()
      val w = 1 + (nChars % 16).toInt
      val h = 1 + (docId % 12).toInt
      val g = (docId % 256).toInt
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bandedRgbImage(w, h, g), "png", bos)
      bos.toByteArray
    }
    spreadDocs(docs).select(
      col("doc_id"),
      mk(col("doc_id"), col("n_chars").cast("long")).as("media"),
      struct(
        lit("image/png").as("media_type"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))
  }

  /** Non-interlaced GIF encode. MODE_DISABLED is load-bearing: the
    * JDK's GIF writer interlaces by default and its reader mis-orders
    * interlaced rows for images under ~5 rows tall (probed: 4×4 rows
    * come back permuted), which would scramble the bottom band.
    * Non-interlaced round-trips exactly for all 256 gray pairs × 9
    * sizes.
    */
  def encodeGif(img: java.awt.image.BufferedImage): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  /** Mixed-container corpus: `doc_id % 3` picks PNG / JPEG / GIF, the
    * dispatch shape a real crawl's media column has. PNG and GIF carry
    * the two-band pattern (both lossless here — the GIF palette holds
    * the 2 grays exactly); JPEG is uniform gray via [[encodeJpegGray]]
    * so the lossy container still decodes to formula-exact pixels.
    */
  def attachImagesMixed(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      noImageDiskCache()
      val w = 1 + (nChars % 16).toInt
      val h = 1 + (docId % 12).toInt
      val g = (docId % 256).toInt
      (docId % 3).toInt match {
        case 1 => encodeJpegGray(w, h, g)
        case 2 => encodeGif(bandedRgbImage(w, h, g))
        case _ =>
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(bandedRgbImage(w, h, g), "png", bos)
          bos.toByteArray
      }
    }
    val mime = expr(
      "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' " +
        "WHEN 1 THEN 'image/jpeg' ELSE 'image/gif' END")
    spreadDocs(docs).select(
      col("doc_id"),
      mk(col("doc_id"), col("n_chars").cast("long")).as("media"),
      struct(
        mime.as("media_type"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))
  }

  /** Sniff the container from magic bytes — the dispatch a mixed
    * media column needs before choosing a reader.
    */
  def imageFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 &&
        bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) "jpeg"
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F' && bytes(3) == '8') "gif"
    else throw new IllegalArgumentException(
      s"unsupported image container (${bytes.take(4).map(b => f"$b%02x").mkString(" ")})")

  val imageFeatureFmtSchema: StructType = StructType(
    StructField("doc_id", LongType) +:
      StructField("fmt", StringType) +: imageFeatureSchema.fields.drop(1))

  /** REAL image decode via `javax.imageio`: container sniff →
    * dimensions + mean luma, with ONE ImageReader per (partition,
    * format) reused across rows — the amortized-init batch shape a
    * production codec needs; only the input stream resets per row.
    *
    * Luma uses integer Rec.601 weights (299·R + 587·G + 114·B, summed
    * as a Long, divided by 1000·n at the end with exact decimal
    * rounding) so gray pixels contribute their gray level EXACTLY and
    * the oracle's rational arithmetic matches bit for bit.
    *
    * TYPE_BYTE_GRAY decodes (grayscale JPEG) read the raster band
    * directly: `getRGB` on a gray image applies the ICC gray→sRGB
    * transform (gray 1 → rgb 13), which would silently break luma
    * exactness. Indexed rasters (GIF) do go through `getRGB` — there
    * the single band holds palette indices, not gray levels.
    */
  def extractImageFeaturesWithFormat(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      noImageDiskCache()
      val readers = scala.collection.mutable.Map.empty[String, javax.imageio.ImageReader]
      def reader(fmt: String) = readers.getOrElseUpdate(fmt,
        javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next())
      val out = it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val fmt = imageFormat(bytes)
        val rd = reader(fmt)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        rd.setInput(iis)
        val img = rd.read(0)
        iis.close()
        val w = img.getWidth
        val h = img.getHeight
        var s = 0L // Σ (299R + 587G + 114B) over pixels, exact
        val grayDirect =
          img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            if (grayDirect) s += 1000L * img.getRaster.getSample(x, y, 0)
            else {
              val rgb = img.getRGB(x, y)
              s += 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
            }
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mean = new java.math.BigDecimal(s)
          .divide(java.math.BigDecimal.valueOf(1000L * n), 6,
            java.math.RoundingMode.HALF_UP)
          .doubleValue()
        Row(id, fmt, w, h, n, mean)
      }
      out ++ { readers.values.foreach(_.dispose()); Iterator.empty }
    }
    spark.createDataFrame(rdd, imageFeatureFmtSchema)
  }

  /** [[extractImageFeaturesWithFormat]] minus the sniffed container
    * column (the single-format corpus shape).
    */
  def extractImageFeatures(spark: SparkSession, media: DataFrame): DataFrame =
    extractImageFeaturesWithFormat(spark, media).drop("fmt")

  /** Multi-frame (animated) GIF encode — the video-container stand-in
    * the JDK can actually produce: `writeToSequence` with interlacing
    * disabled round-trips every frame's pixels and the frame COUNT
    * exactly (probed: 6 frame counts × 3 gray seeds, 0 mismatches).
    */
  def encodeAnimatedGif(w: Int, h: Int, frameGrays: Array[Int]): Array[Byte] = {
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val p = wr.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.prepareWriteSequence(null)
    frameGrays.foreach { g =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), p)
    }
    wr.endWriteSequence()
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  /** Synthesize an animated GIF per document: `1 + doc_id % 5` frames,
    * frame `f` uniform gray `(doc_id % 256 + 17·f) % 256` — frame
    * count and every frame's luma are pure functions of the stored
    * columns, so the whole container→frames→sample loop is
    * oracle-checkable.
    */
  def attachAnimatedGifs(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long, nChars: Long) =>
      noImageDiskCache()
      val w = 1 + (nChars % 16).toInt
      val h = 1 + (docId % 12).toInt
      val g = (docId % 256).toInt
      val n = 1 + (docId % 5).toInt
      encodeAnimatedGif(w, h, Array.tabulate(n)(f => (g + 17 * f) % 256))
    }
    spreadDocs(docs).select(
      col("doc_id"),
      mk(col("doc_id"), col("n_chars").cast("long")).as("media"),
      struct(
        lit("image/gif").as("media_type"),
        col("n_chars").cast("long").as("declared_len")).as("meta"))
  }

  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_frames", IntegerType),
    StructField("n_sampled", IntegerType),
    StructField("mean_luma", DoubleType)))

  /** REAL multi-frame decode + keyframe-style sampling: count the
    * container's frames (`getNumImages(true)`), decode every
    * `stride`-th frame ONLY, and aggregate integer-Rec.601 luma over
    * the sampled frames. This is the video-pipeline batch shape — the
    * expensive per-frame pass touches 1/stride of the frames and
    * decode state is reused per partition; only the stream resets per
    * row.
    */
  def extractVideoFeatures(spark: SparkSession, media: DataFrame,
      stride: Int = 2): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      noImageDiskCache()
      val rd = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val out = it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        rd.setInput(iis)
        val n = rd.getNumImages(true)
        var s = java.math.BigDecimal.ZERO // Σ per-frame mean luma, exact
        var sampled = 0
        var f = 0
        while (f < n) {
          val img = rd.read(f)
          val w = img.getWidth; val h = img.getHeight
          var fs = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              fs += 299L * ((rgb >> 16) & 0xff) +
                587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          // per-frame mean at scale 12: exact for uniform frames (the
          // oracle path), 1e-12-bounded otherwise
          s = s.add(new java.math.BigDecimal(fs).divide(
            java.math.BigDecimal.valueOf(1000L * w * h), 12,
            java.math.RoundingMode.HALF_UP))
          sampled += 1
          f += stride
        }
        iis.close()
        val mean = s.divide(java.math.BigDecimal.valueOf(sampled.toLong), 6,
          java.math.RoundingMode.HALF_UP).doubleValue()
        Row(id, n, sampled, mean)
      }
      out ++ { rd.dispose(); Iterator.empty }
    }
    spark.createDataFrame(rdd, videoFeatureSchema)
  }

  /** PCM16 mono WAV encode via `javax.sound.sampled` (JDK built-in —
    * the audio modality needs no external codec either; probed: 137
    * formula samples round-trip bit-exact).
    */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = (samples(i) >> 8).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic PCM16 WAV per document:
    * `100 + doc_id % 50` samples, sample `i` =
    * `(doc_id·31 + i·17) % 2001 − 1000` — count and amplitude stats
    * are pure functions of doc_id, so the encode→decode→measure loop
    * is oracle-checkable (WAV is lossless; samples survive exactly).
    */
  def attachAudio(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long) =>
      noImageDiskCache()
      val n = 100 + (docId % 50).toInt
      encodeWavPcm16(Array.tabulate(n)(i =>
        ((docId * 31 + i * 17L) % 2001 - 1000).toShort))
    }
    docs.select(
      col("doc_id"),
      mk(col("doc_id")).as("media"),
      struct(
        lit("audio/wav").as("media_type"),
        (lit(100) + col("doc_id") % 50).cast("long").as("declared_len"))
        .as("meta"))
  }

  /** Stereo PCM16 WAV encode: interleaved L/R frames, same container
    * path as [[encodeWavPcm16]]. */
  def encodeWavPcm16Stereo(left: Array[Short], right: Array[Short],
      sampleRate: Float = 8000f): Array[Byte] = {
    require(left.length == right.length, "stereo channels must align")
    val pcm = new Array[Byte](left.length * 4)
    var i = 0
    while (i < left.length) {
      pcm(4 * i) = (left(i) & 0xff).toByte
      pcm(4 * i + 1) = (left(i) >> 8).toByte
      pcm(4 * i + 2) = (right(i) & 0xff).toByte
      pcm(4 * i + 3) = (right(i) >> 8).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 2, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, left.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 8-bit G.711 μ-law mono WAV encode (WAVE format code 7; the JDK
    * writer supports it natively). `samples` are raw μ-law bytes. */
  def encodeWavUlaw(samples: Array[Byte], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.ULAW,
      sampleRate, 8, 1, 1, sampleRate, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", IntegerType),
    StructField("mean_abs", DoubleType),
    StructField("peak", IntegerType)))

  /** REAL audio decode: parse the WAV container with `AudioSystem`,
    * read the PCM16 frames, and compute amplitude features (mean
    * absolute sample, peak) with exact integer accumulation. Same
    * batch shape as the image path — decode state per partition, one
    * stream reset per row.
    */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      noImageDiskCache()
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"expected PCM16 mono, got $fmt")
        val buf = ais.readAllBytes()
        ais.close()
        val n = buf.length / 2
        var s = 0L // Σ |sample|, exact
        var peak = 0
        var i = 0
        while (i < n) {
          val v = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
          val a = math.abs(v)
          s += a
          if (a > peak) peak = a
          i += 1
        }
        val mean = new java.math.BigDecimal(s)
          .divide(java.math.BigDecimal.valueOf(n.toLong), 6,
            java.math.RoundingMode.HALF_UP)
          .doubleValue()
        Row(id, fmt.getSampleRate.toInt, n, mean, peak)
      }
    }
    spark.createDataFrame(rdd, audioFeatureSchema)
  }

  /** Synthesize the round-8 mixed audio corpus: even doc_ids get a
    * STEREO PCM16 WAV (left `(d·31 + i·17) % 2001 − 1000`, right
    * `(d·13 + i·29) % 1601 − 800`, over `100 + d % 50` frames), odd
    * doc_ids an 8-bit μ-law mono WAV (raw μ-law byte
    * `(d·7 + i·11) % 256` over `80 + d % 40` frames) — everything a
    * pure function of doc_id so the decode is oracle-replayable
    * (μ-law expands by the fixed G.711 table, itself closed-form).
    */
  def attachAudio2(docs: DataFrame): DataFrame = {
    val mk = udf { (docId: Long) =>
      noImageDiskCache()
      if (docId % 2 == 0) {
        val n = 100 + (docId % 50).toInt
        encodeWavPcm16Stereo(
          Array.tabulate(n)(i => ((docId * 31 + i * 17L) % 2001 - 1000).toShort),
          Array.tabulate(n)(i => ((docId * 13 + i * 29L) % 1601 - 800).toShort))
      } else {
        val n = 80 + (docId % 40).toInt
        encodeWavUlaw(Array.tabulate(n)(i => ((docId * 7 + i * 11L) % 256).toByte))
      }
    }
    docs.select(col("doc_id"), mk(col("doc_id")).as("media"))
  }

  val audioChannelFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("encoding", StringType),
    StructField("n_channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("mean_abs_l", DoubleType),
    StructField("peak_l", IntegerType),
    StructField("mean_abs_r", DoubleType),
    StructField("peak_r", IntegerType)))

  /** Generalized audio decode: stereo and non-PCM encodings (G.711
    * μ-law/A-law) via `AudioSystem`'s format conversion — the codec
    * chain a real ingest needs (container parse → transcode to linear
    * PCM16 → per-channel amplitude features). Mono rows carry NULL
    * right-channel stats; exact integer accumulation as in
    * [[extractAudioFeatures]]. The JDK μ-law expansion was probed
    * against the G.711 closed form (((2m+33)·2^e − 33)·4 on the
    * complemented byte) — identical for all 256 code points, which is
    * what lets the oracle replay a transcoded decode arithmetically.
    */
  def extractAudioChannelFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    val rdd = media.select(col("doc_id"), col("media")).rdd.mapPartitions { it =>
      noImageDiskCache()
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val src = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val sf = src.getFormat
        val enc = sf.getEncoding match {
          case AudioFormat.Encoding.ULAW => "ulaw"
          case AudioFormat.Encoding.ALAW => "alaw"
          case AudioFormat.Encoding.PCM_SIGNED
              if sf.getSampleSizeInBits == 16 => "pcm16"
          // don't mislabel 8/24/32-bit or float PCM as pcm16 — report
          // the real encoding so downstream filters stay truthful
          case e => (e.toString + "_" + sf.getSampleSizeInBits)
            .toLowerCase.replace(' ', '_')
        }
        val ch = sf.getChannels
        val linear =
          if (sf.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
              sf.getSampleSizeInBits == 16 && !sf.isBigEndian) src
          else AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sf.getSampleRate,
              16, ch, 2 * ch, sf.getSampleRate, false), src)
        val buf = linear.readAllBytes()
        linear.close(); src.close()
        val frames = buf.length / (2 * ch)
        var sL = 0L; var pL = 0; var sR = 0L; var pR = 0
        var i = 0
        while (i < frames) {
          val o = i * 2 * ch
          val l = math.abs(((buf(o) & 0xff) | (buf(o + 1) << 8)).toShort.toInt)
          sL += l; if (l > pL) pL = l
          if (ch > 1) {
            val rv = math.abs(((buf(o + 2) & 0xff) | (buf(o + 3) << 8)).toShort.toInt)
            sR += rv; if (rv > pR) pR = rv
          }
          i += 1
        }
        // a structurally valid WAV may carry an empty data chunk:
        // NULL means, zero peaks — not a divide-by-zero task failure
        def mean(s: Long): Any =
          if (frames == 0) null
          else new java.math.BigDecimal(s)
            .divide(java.math.BigDecimal.valueOf(frames.toLong), 6,
              java.math.RoundingMode.HALF_UP)
            .doubleValue()
        Row(id, enc, ch, sf.getSampleRate.toInt, frames, mean(sL), pL,
          if (ch > 1) mean(sR) else null, if (ch > 1) pR else null)
      }
    }
    spark.createDataFrame(rdd, audioChannelFeatureSchema)
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
           |  sequence(0, greatest(CAST(floor(length(media) / $frameBytes) AS INT) - 1, 0), $stride),
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
      noImageDiskCache()
      // per-partition decoder init would go here
      it.map { r => StubDecoder.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
