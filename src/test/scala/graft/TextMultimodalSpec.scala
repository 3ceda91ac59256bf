package graft

import org.apache.spark.sql.functions._

/** Text analysis heuristics + multimodal plumbing. */
class TextMultimodalSpec extends SparkSpecBase {

  test("language-ID picks the right stopword profile") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "der hund ist mit den kindern im garten und das ist gut"),
      (3L, "le chat est dans la maison et les enfants sont dans le jardin"),
      (4L, "xyzzy qwerty plugh")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.languageId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(2L) == "de")
    assert(got(3L) == "fr")
    assert(got(4L) == "und")
    // the single-tokenization hot-path form agrees everywhere
    val fast = TextAnalysis.withLanguageId(df, "text", "lg")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lg")).toMap
    assert(fast == got, s"$fast != $got")
  }

  test("language-ID accuracy 1.0 on a stopword-bearing constructed corpus") {
    // quantified check for the no_oracle q_text_langid row. The
    // driver's synthetic documents carry a decorative lang label (the
    // text is the same token vocabulary for every label), so accuracy
    // must be measured on text that actually bears the language:
    // 100 docs per language built from that language's function words
    // mixed with neutral filler must classify perfectly.
    val s = spark
    import s.implicits._
    val filler = Seq("data", "table", "row", "value", "query")
    val langs = Seq("en", "de", "fr", "es")
    val docs = (for {
      (lang, li) <- langs.zipWithIndex
      i <- 0 until 100
    } yield {
      val sw = TextAnalysis.stopwords(lang)
      val words = (0 until 12).map(j =>
        if (j % 2 == 0) sw((i + j) % sw.length)
        else filler((i * 7 + j) % filler.length))
      ((li * 100 + i).toLong, lang, words.mkString(" "))
    }).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.withLanguageId(docs, "text", "lg")
      .select(col("lang"), col("lg")).collect()
    val acc = got.count(r => r.getString(0) == r.getString(1)).toDouble / got.length
    assert(acc >= 0.95, s"lang-ID accuracy $acc on constructed corpus")
  }

  test("frame sampling slices exact byte windows at the stride") {
    val s = spark
    import s.implicits._
    val text = "abcdefgh" * 20 // 160 bytes → 5 frames of 32, sample 0 and 4
    val df = Multimodal.attachMedia(Seq((1L, text)).toDF("doc_id", "text"))
    val frames = Multimodal.sampleFrames(df, frameBytes = 32, stride = 4)
      .orderBy("frame_no").collect()
    assert(frames.length == 2, frames.mkString(","))
    val f0 = new String(frames(0).getAs[Array[Byte]]("frame"), "UTF-8")
    val f1 = new String(frames(1).getAs[Array[Byte]]("frame"), "UTF-8")
    assert(f0 == text.substring(0, 32))
    assert(f1 == text.substring(128, 160))
    assert(frames.forall(_.getAs[Long]("frame_len") == 32L))
    // resize clamps the byte budget
    val resized = Multimodal.resizeMedia(df, 48)
      .select(length(col("media"))).collect().head.getInt(0)
    assert(resized == 48)
  }

  test("quality score is bounded and components are sane") {
    val docs = Tables.load(spark, sfDir, "documents")
    val q = TextAnalysis.qualityFeatures(docs, "text")
      .agg(min("quality"), max("quality"), min("stopword_ratio"),
        max("punct_ratio")).collect().head
    assert(q.getDouble(0) >= 0.0 && q.getDouble(1) <= 1.0)
    assert(q.getDouble(2) >= 0.0 && q.getDouble(3) <= 1.0)
  }

  test("fingerprint is stable and normalization-invariant") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "Hello, World!"), (2L, "hello world"),
      (3L, "different text")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L)) // punctuation/case stripped
    assert(fp(1L) != fp(3L))
  }

  test("multimodal: schema, batch decode, features match manual compute") {
    val docs = Tables.load(spark, sfDir, "documents").limit(10)
    val media = Multimodal.attachMedia(docs)
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.schema == Multimodal.featureSchema)
    val one = feats.orderBy("doc_id").limit(1).collect().head
    val text = docs.orderBy("doc_id").limit(1).collect().head.getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(one.getLong(1) == bytes.length.toLong)
    assert(one.getInt(2) == (bytes(0) & 0xff))
    assert(one.getLong(3) == bytes.length / 32)
  }

  test("multimodal: javax.imageio decodes golden PNG, BMP and GIF exactly") {
    // hand-built 2×1 image: pure red + pure blue. Integer Rec.601:
    // (299·255 + 114·255) / (1000·2) = 105315/2000 = 52.6575
    // GIF rides the same golden: 2 colors fit its palette exactly.
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    img.setRGB(1, 0, 0x0000ff)
    for (fmt <- Seq("png", "bmp", "gif")) {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      val bytes = bos.toByteArray
      assert(Multimodal.imageFormat(bytes) == fmt)
      val s = spark
      import s.implicits._
      val media = Seq((7L, bytes)).toDF("doc_id", "media")
      val r = Multimodal.extractImageFeatures(spark, media).collect().head
      assert(r.getLong(0) == 7L && r.getInt(1) == 2 && r.getInt(2) == 1 &&
        r.getLong(3) == 2L, r.toString)
      assert(r.getDouble(4) == 52.6575, s"$fmt mean_luma = ${r.getDouble(4)}")
    }
  }

  test("multimodal: quality-1.0 grayscale JPEG decodes raster-exact for every gray level") {
    // the property the JPEG oracle rests on: a uniform TYPE_BYTE_GRAY
    // image at compression quality 1.0 round-trips every gray level
    // exactly (constant DCT blocks + all-ones quant table), and the
    // decoder must read the raster band — getRGB's ICC gray→sRGB
    // transform maps gray 1 to rgb 13 and would poison the luma.
    val s = spark
    import s.implicits._
    val rows = (0 until 256).map { g =>
      ((g + 1000).toLong, Multimodal.encodeJpegGray(1 + g % 16, 1 + g % 12, g))
    }
    assert(rows.forall(r => Multimodal.imageFormat(r._2) == "jpeg"))
    val feats = Multimodal.extractImageFeatures(
        spark, rows.toDF("doc_id", "media"))
      .orderBy("doc_id").collect()
    feats.zipWithIndex.foreach { case (r, g) =>
      assert(r.getInt(1) == 1 + g % 16 && r.getInt(2) == 1 + g % 12, r.toString)
      assert(r.getDouble(4) == g.toDouble, s"gray $g decoded as ${r.getDouble(4)}")
    }
  }

  test("multimodal: photographic JPEG (quality 0.8) decodes dims exact, mean luma within 1 gray") {
    // the general lossy-decode gate: non-uniform content at quality
    // < 1 exercises real quantization (unlike the raster-exact
    // uniform-gray construction the oracle rides), so a reader
    // regression can no longer hide behind the DC-only case. Smooth
    // gradients + a diagonal ramp stand in for photographic content.
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var lumaSum = 0L // Σ (299R + 587G + 114B) of the SOURCE pixels
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 255) / (w - 1)
      val g = (y * 255) / (h - 1)
      val b = ((x + y) * 255) / (w + h - 2)
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      lumaSum += 299L * r + 587L * g + 114L * b
    }
    val srcMean = lumaSum.toDouble / (1000.0 * w * h)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(0.8f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    val bytes = bos.toByteArray
    assert(Multimodal.imageFormat(bytes) == "jpeg")
    val s = spark
    import s.implicits._
    val feats = Multimodal.extractImageFeatures(
      spark, Seq((42L, bytes)).toDF("doc_id", "media")).collect().head
    assert(feats.getInt(1) == w && feats.getInt(2) == h &&
      feats.getLong(3) == w.toLong * h, feats.toString)
    val got = feats.getDouble(4)
    assert(math.abs(got - srcMean) <= 1.0,
      s"photographic JPEG mean luma drifted: decoded $got vs source $srcMean")
  }

  test("multimodal: animated GIF frame count + strided sampling round-trip") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val feats = Multimodal.extractVideoFeatures(
      spark, Multimodal.attachAnimatedGifs(docs), stride = 2).collect()
    feats.foreach { r =>
      val id = r.getLong(0)
      val n = 1 + (id % 5).toInt
      val g = (id % 256).toInt
      val sampledF = 0 until n by 2
      assert(r.getInt(1) == n, r.toString)
      assert(r.getInt(2) == sampledF.size, r.toString)
      val expect = (BigDecimal(sampledF.map(f => (g + 17 * f) % 256).sum) /
        BigDecimal(sampledF.size))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(3) == expect.toDouble,
        s"doc $id: ${r.getDouble(3)} != $expect")
    }
  }

  test("multimodal: WAV PCM16 audio decode round-trips amplitude features") {
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val feats = Multimodal.extractAudioFeatures(
      spark, Multimodal.attachAudio(docs)).collect()
    feats.foreach { r =>
      val id = r.getLong(0)
      val n = 100 + (id % 50).toInt
      val samples = (0 until n).map(i => (id * 31 + i * 17L) % 2001 - 1000)
      assert(r.getInt(1) == 8000 && r.getInt(2) == n, r.toString)
      val expect = (BigDecimal(samples.map(math.abs).sum) / BigDecimal(n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(3) == expect.toDouble,
        s"doc $id: ${r.getDouble(3)} != $expect")
      assert(r.getInt(4) == samples.map(math.abs).max.toInt, r.toString)
    }
  }

  test("multimodal: stereo PCM16 and mu-law WAV decode per-channel features") {
    // G.711 μ-law expansion, closed form: the JDK codec was probed
    // identical for all 256 code points
    def ulawAbs(u: Int): Int = {
      val c = 255 - u
      ((2 * (c % 16) + 33) * (1 << ((c / 16) % 8)) - 33) * 4
    }
    // table pin: encode all 256 μ-law codes, decode through the JDK
    // chain, and match the closed form exactly
    val s = spark
    import s.implicits._
    val codes = Multimodal.encodeWavUlaw(Array.tabulate(256)(i => i.toByte))
    val tab = Multimodal.extractAudioChannelFeatures(
      spark, Seq((1L, codes)).toDF("doc_id", "media")).collect().head
    assert(tab.getString(1) == "ulaw" && tab.getInt(2) == 1 &&
      tab.getInt(4) == 256, tab.toString)
    val expectAll = (0 until 256).map(ulawAbs)
    assert(tab.getInt(6) == expectAll.max, tab.toString)
    assert(tab.isNullAt(7) && tab.isNullAt(8), "mono must NULL right channel")
    val meanAll = (BigDecimal(expectAll.sum) / 256)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(tab.getDouble(5) == meanAll.toDouble, tab.toString)
    // a structurally valid WAV with an empty data chunk must yield a
    // row (NULL means, zero frames), not a divide-by-zero task failure
    val empty = Multimodal.extractAudioChannelFeatures(
      spark, Seq((2L, Multimodal.encodeWavUlaw(Array.empty[Byte])))
        .toDF("doc_id", "media")).collect().head
    assert(empty.getInt(4) == 0 && empty.isNullAt(5) && empty.getInt(6) == 0,
      empty.toString)
    // corpus replay: even docs stereo PCM16, odd docs μ-law mono
    val docs = Tables.load(spark, sfDir, "documents").limit(20)
    val feats = Multimodal.extractAudioChannelFeatures(
      spark, Multimodal.attachAudio2(docs)).collect()
    def m6(xs: Seq[Int]) = (BigDecimal(xs.map(_.toLong).sum) / xs.size)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    feats.foreach { r =>
      val id = r.getLong(0)
      if (id % 2 == 0) {
        val n = 100 + (id % 50).toInt
        val l = (0 until n).map(i => math.abs((id * 31 + i * 17L) % 2001 - 1000).toInt)
        val rt = (0 until n).map(i => math.abs((id * 13 + i * 29L) % 1601 - 800).toInt)
        assert(r.getString(1) == "pcm16" && r.getInt(2) == 2 &&
          r.getInt(3) == 8000 && r.getInt(4) == n, r.toString)
        assert(r.getDouble(5) == m6(l) && r.getInt(6) == l.max, r.toString)
        assert(r.getDouble(7) == m6(rt) && r.getInt(8) == rt.max, r.toString)
      } else {
        val n = 80 + (id % 40).toInt
        val a = (0 until n).map(i => ulawAbs(((id * 7 + i * 11L) % 256).toInt))
        assert(r.getString(1) == "ulaw" && r.getInt(2) == 1 &&
          r.getInt(4) == n, r.toString)
        assert(r.getDouble(5) == m6(a) && r.getInt(6) == a.max, r.toString)
        assert(r.isNullAt(7) && r.isNullAt(8), r.toString)
      }
    }
  }

  test("multimodal: mixed PNG/JPEG/GIF corpus sniffs and round-trips per container") {
    val docs = Tables.load(spark, sfDir, "documents").limit(24)
    val feats = Multimodal.extractImageFeaturesWithFormat(
      spark, Multimodal.attachImagesMixed(docs)).collect()
    val cols = docs.select(col("doc_id").cast("long"),
      col("n_chars").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(feats.map(_.getString(1)).toSet == Set("png", "jpeg", "gif"))
    feats.foreach { r =>
      val id = r.getLong(0)
      val fmt = Seq("png", "jpeg", "gif")((id % 3).toInt)
      val w = 1 + (cols(id) % 16).toInt
      val h = 1 + (id % 12).toInt
      val g = (id % 256).toInt
      val expect =
        if (fmt == "jpeg") BigDecimal(g)
        else {
          val nTop = (h + 1) / 2
          (BigDecimal(nTop * g + (h - nTop) * ((g + 64) % 256)) / BigDecimal(h))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      assert(r.getString(1) == fmt, r.toString)
      assert(r.getInt(2) == w && r.getInt(3) == h, r.toString)
      assert(r.getDouble(5) == expect.toDouble,
        s"doc $id ($fmt): ${r.getDouble(5)} != $expect")
    }
  }

  test("multimodal: synthesized corpus round-trips encode -> decode") {
    val docs = Tables.load(spark, sfDir, "documents").limit(24)
    val feats = Multimodal.extractImageFeatures(
      spark, Multimodal.attachImages(docs)).collect()
    val cols = docs.select(col("doc_id").cast("long"),
      col("n_chars").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.foreach { r =>
      val id = r.getLong(0)
      val w = 1 + (cols(id) % 16).toInt
      val h = 1 + (id % 12).toInt
      val g = (id % 256).toInt
      val g2 = (g + 64) % 256
      val nTop = (h + 1) / 2
      val expect = (BigDecimal(nTop * g + (h - nTop) * g2) / BigDecimal(h))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getInt(1) == w && r.getInt(2) == h, r.toString)
      assert(r.getDouble(4) == expect.toDouble,
        s"doc $id: ${r.getDouble(4)} != $expect")
    }
  }

  test("bigram NLL: predictable contexts score lower, short docs NULL") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "red blue red blue red blue red blue red blue"),
      (2L, "red green blue yellow purple orange cyan magenta lime teal"),
      (3L, "single")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.toString.toDouble)))).toMap
    assert(got(1L)._1 == 9L && got(2L)._1 == 9L)
    // "red blue" repeats: p(blue|red) = 1 there, every bigram in doc 2
    // is a one-off — the repetitive doc must score strictly lower NLL
    assert(got(1L)._2.get < got(2L)._2.get,
      s"${got(1L)._2} !< ${got(2L)._2}")
    assert(got(3L) == ((0L, None)), "sub-bigram doc reports 0 + NULL")
  }

  test("URL domain stats: extraction, domain reduce, per-doc distinct") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "go to https://a.example.com/x and https://a.example.com/y now"),
      (2L, "see http://b.net/z plus https://a.example.com"),
      (3L, "no links here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.urlDomainStats(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "a.example.com" -> ((3L, 2L)), // 3 urls across docs 1+2
      "b.net" -> ((1L, 1L))))
  }

  test("C4 line cleaning: every rule fires on its construction") {
    val s = spark
    import s.implicits._
    val good = "this line ends with a period."
    val df = Seq(
      // rule 1: non-terminal line dropped, terminal kept
      (1L, s"$good\nno terminal punctuation here\nanother good line stays!\nthird keeper line here?"),
      // rule 2: short line (2 words) dropped even with punctuation
      (2L, s"$good\ntoo short.\nsecond keeper line here.\nthird keeper line here."),
      // rule 3: javascript line dropped (case-folded)
      (3L, s"$good\nenable JavaScript to view this page.\nsecond keeper line here.\nthird keeper line here."),
      // page rule: lorem ipsum kills the page outright
      (4L, s"$good\n$good\n$good\nlorem IPSUM dolor sit amet."),
      // page rule: curly brace kills the page
      (5L, s"$good\n$good\nfunction f() { return 1; }."),
      // page rule: fewer than minKeptLines survivors
      (6L, s"$good\n$good"),
      // clean page survives intact
      (7L, s"$good\n$good\n$good")).toDF("doc_id", "text")
    val got = TextAnalysis.c4LineClean(df, "doc_id", "text",
        minWordsPerLine = 3, minKeptLines = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("kept"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"), r.getAs[String]("clean_text")))).toMap
    assert(got(1L) == ((true, 4L, 3L,
      s"$good\nanother good line stays!\nthird keeper line here?")))
    assert(got(2L) == ((true, 4L, 3L,
      s"$good\nsecond keeper line here.\nthird keeper line here.")))
    assert(got(3L) == ((true, 4L, 3L,
      s"$good\nsecond keeper line here.\nthird keeper line here.")))
    assert(got(4L)._1 == false && got(4L)._4 == "")
    assert(got(5L)._1 == false && got(5L)._4 == "")
    assert(got(6L) == ((false, 2L, 2L, "")))
    assert(got(7L) == ((true, 3L, 3L, s"$good\n$good\n$good")))
  }
}
