package graft

import graft.operators._
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, partition preservation, stub determinism. */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = {
    Tables.register(spark, sfDir)
    Multimodal.fromDocuments(spark.table("documents"))
  }

  test("fromDocuments schema: opaque binary + typed columns") {
    val f = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(f("content") == "binary")
    assert(f("media_type") == "string")
    assert(f("media_id") == "long")
  }

  test("decodeStub is deterministic and map-only (no shuffle)") {
    val items = Multimodal.asItems(media)
    val a = Multimodal.decodeStub(items).collect().sortBy(_.media_id)
    val b = Multimodal.decodeStub(items).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.forall(m => m.n_bytes == 32 && m.channels >= 1 && m.channels <= 4))
    val plan = Multimodal.decodeStub(items).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode should not shuffle:\n$plan")
  }

  test("decodeStub preserves partitioning (one iterator per partition)") {
    val items = Multimodal.asItems(media.repartition(5))
    assert(Multimodal.decodeStub(items).rdd.getNumPartitions == 5)
  }

  test("featureStub emits fixed-dim vectors") {
    val feats = Multimodal.featureStub(Multimodal.asItems(media), dims = 8).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(f => f.feature.length == 8 &&
      f.feature.forall(v => v >= 0f && v < 1f)))
  }

  test("winnowing handles docs shorter than one window (no crash, no prints)") {
    import org.apache.spark.sql.types._
    val short = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(1L, "tiny"),          // < k chars → filtered
        org.apache.spark.sql.Row(2L, "ninechars"),     // 2 hashes < w → empty set
        org.apache.spark.sql.Row(3L, "a decently long document body")),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val out = graft.operators.TextAnalysis.winnowing(short, k = 8, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(1L))
    assert(out(2L) == 0L)
    assert(out(3L) > 0L)
  }

  test("pngFromDocuments emits REAL PNGs; decodeImage reproduces the " +
    "pixel formula exactly (lossless round-trip); map-only") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").orderBy("doc_id").limit(20)
    val pngs = Multimodal.pngFromDocuments(docs)
    // genuine PNG magic bytes
    pngs.collect().foreach { m =>
      assert(m.content.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a),
        s"media_id=${m.media_id}: not a PNG")
    }
    val decoded = Multimodal.decodeImage(pngs)
    assert(!decoded.queryExecution.executedPlan.toString.contains("Exchange"))
    decoded.collect().foreach { m =>
      val (w, h) = ((4 + m.media_id % 13).toInt, (3 + m.media_id % 11).toInt)
      assert(m.width == w && m.height == h && m.channels == 3, m)
      def mean(px: (Long, Int, Int) => Int): Double = {
        val s = (for (x <- 0 until w; y <- 0 until h)
          yield px(m.media_id, x, y).toLong).sum
        BigDecimal(s.toDouble / (w * h))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(m.avg_r == mean(Multimodal.pxR), s"avg_r ${m.media_id}")
      assert(m.avg_g == mean(Multimodal.pxG), s"avg_g ${m.media_id}")
      assert(m.avg_b == mean(Multimodal.pxB), s"avg_b ${m.media_id}")
    }
  }

  test("decodeImage goldens: hand-built RGB PNG, JPEG auto-detect, grayscale") {
    import spark.implicits._
    def png(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val rgb = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xff0000); rgb.setRGB(1, 0, 0x00ff00)
    val gray = new java.awt.image.BufferedImage(
      3, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    gray.getRaster.setSample(0, 0, 0, 10)
    gray.getRaster.setSample(1, 0, 0, 20)
    gray.getRaster.setSample(2, 0, 0, 60)
    val items = Seq(
      MediaItem(1L, "image", png(rgb, "png")),
      MediaItem(2L, "image", png(rgb, "jpg")), // format auto-detected
      MediaItem(3L, "image", png(gray, "png"))).toDS()
    val got = Multimodal.decodeImage(items).collect()
      .map(m => m.media_id -> m).toMap
    // PNG is lossless: exact channel means
    assert(got(1L).width == 2 && got(1L).height == 1 && got(1L).channels == 3)
    assert((got(1L).avg_r, got(1L).avg_g, got(1L).avg_b) == ((127.5, 127.5, 0.0)))
    // JPEG: lossy pixels, but dims/channels are exact
    assert(got(2L).width == 2 && got(2L).height == 1 && got(2L).channels == 3)
    // grayscale: one band, reported in all three means
    assert(got(3L).channels == 1)
    assert((got(3L).avg_r, got(3L).avg_g, got(3L).avg_b) == ((30.0, 30.0, 30.0)))
  }

  test("decodeImage resolves palettes and alpha through the color model: " +
    "GIF means are pixel intensities (not palette indices), RGBA reports " +
    "color means (not the alpha band)") {
    import spark.implicits._
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    // GIF forces an indexed palette: raw raster samples would be indices
    val rgb = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xff0000); rgb.setRGB(1, 0, 0x00ff00)
    // RGBA: band 3 is alpha — naive band sampling reported it as avg_b
    val rgba = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    rgba.setRGB(0, 0, 0xffff0000); rgba.setRGB(1, 0, 0xff00ff00)
    val items = Seq(
      MediaItem(1L, "image", enc(rgb, "gif")),
      MediaItem(2L, "image", enc(rgba, "png"))).toDS()
    val got = Multimodal.decodeImage(items).collect()
      .map(m => m.media_id -> m).toMap
    // palette preserves the two exact colors; means match the RGB source
    assert(got(1L).channels >= 3, got(1L))
    assert((got(1L).avg_r, got(1L).avg_g, got(1L).avg_b) == ((127.5, 127.5, 0.0)),
      got(1L))
    assert(got(2L).channels == 4, got(2L))
    assert((got(2L).avg_r, got(2L).avg_g, got(2L).avg_b) == ((127.5, 127.5, 0.0)),
      got(2L))
    // 16-bit grayscale normalizes to the 0-255 scale every other image
    // reports on: samples {0, 65535} must mean 127.5, not ~32768
    val g16 = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    g16.getRaster.setSample(0, 0, 0, 0)
    g16.getRaster.setSample(1, 0, 0, 65535)
    val m16 = Multimodal.decodeImage(
      Seq(MediaItem(3L, "image", enc(g16, "png"))).toDS()).collect().head
    assert(m16.channels == 1, m16)
    assert((m16.avg_r, m16.avg_g, m16.avg_b) == ((127.5, 127.5, 127.5)), m16)
  }

  test("resizeImage: nearest-neighbor golden up- and down-scale, " +
    "decode-after-resize reports target dims; map-only") {
    import spark.implicits._
    val src = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    src.setRGB(0, 0, 0xff0000); src.setRGB(1, 0, 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val items = Seq(MediaItem(7L, "image", bos.toByteArray)).toDS()
    // upscale 2x1 -> 4x2: NN mapping floor(x*2/4) duplicates each column
    val up = Multimodal.resizeImage(items, w = 4, h = 2)
    assert(!up.queryExecution.executedPlan.toString.contains("Exchange"))
    val upMeta = Multimodal.decodeImage(up).collect().head
    assert(upMeta.width == 4 && upMeta.height == 2)
    assert((upMeta.avg_r, upMeta.avg_g, upMeta.avg_b) == ((127.5, 0.0, 127.5)))
    // downscale 2x1 -> 1x1: NN keeps pixel (floor(0*2/1)=0, 0) = pure red
    val downMeta = Multimodal.decodeImage(
      Multimodal.resizeImage(items, w = 1, h = 1)).collect().head
    assert(downMeta.width == 1 && downMeta.height == 1)
    assert((downMeta.avg_r, downMeta.avg_g, downMeta.avg_b) == ((255.0, 0.0, 0.0)))
  }

  test("wavFromDocuments emits REAL WAVs; decodeAudio reproduces the " +
    "sample formula's rate, duration, and per-channel RMS exactly") {
    val docs = spark.range(0, 30).selectExpr("id AS doc_id")
    val got = Multimodal.decodeAudio(Multimodal.wavFromDocuments(docs))
      .collect().map(a => a.media_id -> a).toMap
    assert(got.size == 30)
    (0L until 30L).foreach { id =>
      val a = got(id)
      val rate = (8000 + (id % 3) * 4000).toInt
      val ch = (1 + id % 2).toInt
      val frames = (50 + id % 101).toInt
      assert(a.sample_rate == rate && a.channels == ch && a.bits == 16 &&
        a.n_frames == frames, a)
      assert(a.duration_s == BigDecimal(frames.toDouble / rate)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, a)
      def rms(c: Int): Double = {
        val ss = (0 until frames).map { s =>
          val v = Multimodal.pcmSample(id, c, s).toDouble; v * v
        }.sum
        BigDecimal(math.sqrt(ss / frames))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(a.rms_c0 == rms(0), a)
      assert(a.rms_c1 == (if (ch == 2) rms(1) else rms(0)), a)
    }
  }

  test("decodeAudio goldens: big-endian AIFF container, and garbage bytes " +
    "fail loudly") {
    import spark.implicits._
    // hand-built stereo clip through the JDK's AIFF writer (16-bit
    // big-endian PCM) — covers the endianness branch the WAV path doesn't
    val samples = Seq((1000, -1000), (500, 250), (-750, 125), (0, -125))
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, true)
    val raw = new Array[Byte](samples.length * 4)
    samples.zipWithIndex.foreach { case ((l, r), i) =>
      raw(i * 4) = ((l >> 8) & 0xff).toByte
      raw(i * 4 + 1) = (l & 0xff).toByte
      raw(i * 4 + 2) = ((r >> 8) & 0xff).toByte
      raw(i * 4 + 3) = (r & 0xff).toByte
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
    val meta = Multimodal.decodeAudio(
      Seq(MediaItem(7L, "audio", bos.toByteArray)).toDS()).collect().head
    assert(meta.sample_rate == 8000 && meta.channels == 2 &&
      meta.bits == 16 && meta.n_frames == 4, meta)
    def rms(vs: Seq[Int]): Double = BigDecimal(
        math.sqrt(vs.map(v => v.toDouble * v).sum / vs.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(meta.rms_c0 == rms(samples.map(_._1)), meta)
    assert(meta.rms_c1 == rms(samples.map(_._2)), meta)
    val garbage = Seq(MediaItem(8L, "audio",
      Array.tabulate[Byte](64)(i => (i * 37).toByte))).toDS()
    intercept[Exception](Multimodal.decodeAudio(garbage).collect())
  }

  test("frameSampleStub yields n frames per video only") {
    val frames = Multimodal.frameSampleStub(Multimodal.asItems(media), n = 4)
    val videos = media.where(col("media_type") === "video").count()
    assert(frames.count() == videos * 4)
  }

  test("imageDHash: flat image hashes to 0, a horizontal ramp to all-ones; " +
    "identical bytes pair at hamming 0 and the pair join is banded") {
    import spark.implicits._
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val flat = png(9, 8)((_, _) => 0x808080)
    // gray strictly increases along x at every grid step -> all 64 bits
    val ramp = png(9, 8)((x, _) => { val v = x * 20; (v << 16) | (v << 8) | v })
    val items = Seq(
      MediaItem(1L, "image", flat),
      MediaItem(2L, "image", ramp),
      MediaItem(3L, "image", ramp) // identical bytes, different id
    ).toDS()
    val hashes = Multimodal.imageDHash(items).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("dhash")).toMap
    assert(hashes(1L) == 0L, s"flat image must hash to 0, got ${hashes(1L)}")
    assert(hashes(2L) == -1L, s"ramp must set all 64 bits, got ${hashes(2L)}")
    assert(hashes(2L) == hashes(3L))
    val dups = Multimodal.imageNearDup(items).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(dups.contains((2L, 3L)) && dups((2L, 3L)) == 0L, dups)
    // flat-vs-ramp is 64 bits apart: never a candidate (no shared band)
    assert(!dups.contains((1L, 2L)) && !dups.contains((1L, 3L)), dups)
    // candidate generation is a banded equi-join, never all-pairs
    val plan = Multimodal.imageNearDup(items)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup join must be banded:\n$plan")
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDup(items, maxHamming = 4)
    }
  }

  test("imageAHash golden: flat image -> 0 (strict mean compare), " +
    "half-bright image sets exactly the bright half's bits") {
    import spark.implicits._
    def png(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val flat = png(8, 8)((_, _) => 0x404040)
    // left 4 columns dark, right 4 bright: mean sits between, so exactly
    // the 4 bright columns' bits set in every row
    val half = png(8, 8)((x, _) => if (x < 4) 0x101010 else 0xf0f0f0)
    val items = Seq(MediaItem(1L, "image", flat),
      MediaItem(2L, "image", half)).toDS()
    val got = Multimodal.imageAHash(items).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("ahash")).toMap
    assert(got(1L) == 0L, s"flat must hash to 0, got ${got(1L)}")
    val expected = (0 until 8).map { y =>
      (4 until 8).map(x => 1L << (y * 8 + x)).sum }.sum
    assert(got(2L) == expected, s"half-bright: ${got(2L)} vs $expected")
  }

  test("audioFingerprint: alternating waveform sets alternating bits; " +
    "identical clips pair at hamming 0 via the shared banding") {
    import spark.implicits._
    // 16-bit mono PCM WAV bytes built by the JDK's own writer
    def wav(samples: Array[Short]): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val bytes = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (v, i) =>
        bytes(2 * i) = (v & 0xff).toByte
        bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, samples.length)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 66 samples alternating 0, 100: sample(i+1) > sample(i) iff i even
    val alt = wav(Array.tabulate(66)(i => if (i % 2 == 0) 0.toShort else 100.toShort))
    val items = Seq(MediaItem(1L, "audio", alt), MediaItem(2L, "audio", alt),
      // strictly decreasing ramp: no bit set -> far from the others
      MediaItem(3L, "audio", wav(Array.tabulate(66)(i => (1000 - i * 10).toShort)))
    ).toDS()
    val fp = Multimodal.audioFingerprint(items).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("channel")) ->
        r.getAs[Long]("fp")).toMap
    val expected = (0 until 64 by 2).map(1L << _).sum
    assert(fp((1L, 0)) == expected, s"alternating fp ${fp((1L, 0))} vs $expected")
    assert(fp((3L, 0)) == 0L)
    val dups = Multimodal.audioNearDup(items).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(dups == Map((1L, 2L) -> 0L), dups)
  }

  test("imageFilter: min short side and cross-multiplied aspect rule on " +
    "real decoded dims; byte rule disabled at 0 and enforced when set") {
    import spark.implicits._
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val items = Seq(
      MediaItem(1L, "image", png(8, 8)),    // passes both rules
      MediaItem(2L, "image", png(10, 5)),   // aspect 2:1 EXACTLY -> ok,
                                            // but short side 5 < 6 fails
      MediaItem(3L, "image", png(20, 6)),   // aspect fails (20 > 2*6)
      MediaItem(4L, "image", png(12, 6))    // aspect boundary passes
    ).toDS()
    val got = graft.operators.Multimodal.imageFilter(items)
      .orderBy("media_id")
      .collect().map(r => (r.getAs[Long]("media_id"),
        r.getAs[Boolean]("dim_ok"), r.getAs[Boolean]("aspect_ok"),
        r.getAs[Boolean]("keep"))).toSeq
    assert(got == Seq(
      (1L, true, true, true), (2L, false, true, false),
      (3L, true, false, false), (4L, true, true, true)), got)
    // every PNG here is bigger than 30 bytes; a 1 MB floor kills them all
    val strict = graft.operators.Multimodal.imageFilter(items,
      minBytes = 1 << 20)
    assert(strict.where(col("keep")).count() == 0L)
    assert(strict.where(col("bytes_ok")).count() == 0L)
    // undecodable bytes are a REJECT verdict, never a job failure: a
    // curation gate exists to discard junk, and real crawls always
    // contain truncated fetches
    val withJunk = (items.collect().toSeq :+
      MediaItem(9L, "image", Array[Byte](1, 2, 3))).toDS()
    val junkRow = graft.operators.Multimodal.imageFilter(withJunk)
      .where(col("media_id") === 9L).collect().head
    assert(!junkRow.getAs[Boolean]("decode_ok") &&
      !junkRow.getAs[Boolean]("keep") &&
      junkRow.isNullAt(junkRow.fieldIndex("width")), junkRow)
    assert(graft.operators.Multimodal.imageFilter(withJunk)
      .where(col("decode_ok") && col("keep")).count() == 2L)
  }

  test("imageTextAlignment: unit-vector towers give scores in [-1, 1], " +
    "keep tracks the threshold exactly, the gate is deterministic, and " +
    "an unmatched caption produces no row") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").orderBy("doc_id").limit(20)
    val media = graft.operators.Multimodal.pngFromDocuments(docs)
    val got = graft.operators.Multimodal
      .imageTextAlignment(media, spark.table("documents"), threshold = 0.0)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(got.length == 20, got.length)
    assert(got.forall { case (_, s, _) => s >= -1.0001 && s <= 1.0001 }, got)
    assert(got.forall { case (_, s, k) => k == (s >= 0.0) }, got)
    // deterministic stub: a second run scores identically
    val again = graft.operators.Multimodal
      .imageTextAlignment(media, spark.table("documents"), threshold = 0.0)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(again == got)
    // a stricter threshold only shrinks the kept set
    val strictKept = graft.operators.Multimodal
      .imageTextAlignment(media, spark.table("documents"), threshold = 0.2)
      .where(col("keep")).count()
    assert(strictKept <= got.count(_._3), s"$strictKept vs ${got.count(_._3)}")
  }
}
