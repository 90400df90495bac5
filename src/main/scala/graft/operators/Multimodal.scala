package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque bytes + typed metadata. The content column is an
  * opaque BINARY — images/audio/video are never parsed by the engine itself,
  * only by explicitly invoked decode operators. */
case class MediaItem(media_id: Long, media_type: String, content: Array[Byte])

/** Decoded (stubbed) media header metadata. */
case class MediaMeta(media_id: Long, media_type: String, width: Int,
                     height: Int, channels: Int, n_bytes: Long)

/** REAL decoded image metadata + per-channel pixel means (the statistic an
  * oracle can recompute when the pixels are formula-generated). */
case class ImageMeta(media_id: Long, media_type: String, width: Int,
                     height: Int, channels: Int, avg_r: Double,
                     avg_g: Double, avg_b: Double)

/** REAL decoded audio metadata + per-channel RMS (the statistic an oracle
  * can recompute when the waveform is formula-generated). Mono reports its
  * single channel's RMS in both rms columns (the grayscale convention). */
case class AudioMeta(media_id: Long, media_type: String, sample_rate: Int,
                     channels: Int, bits: Int, n_frames: Long,
                     duration_s: Double, rms_c0: Double, rms_c1: Double)

/** Per-channel audio features from REAL PCM decode (media_id, channel,
  * rms, zero-crossing rate, peak amplitude). */
case class AudioFeatures(media_id: Long, channel: Int, rms: Double,
                         zcr: Double, peak_abs: Long)

/** Extracted (stubbed) feature vector for a media object. */
case class MediaFeature(media_id: Long, feature: Array[Float])

/** One sampled frame of a video object. */
case class MediaFrame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** Multimodal-column plumbing for training-data pipelines: opaque binary
  * content + typed metadata, with decode / feature-extraction / frame-sample
  * operators running as `mapPartitions` over the binary column (the Scala
  * analog of `mapInPandas` — one iterator per partition, so a real decoder
  * would amortize library init per partition, not per row).
  *
  * IMAGE operators are REAL: `decodeImage` and `resizeImage` run
  * javax.imageio (pure-JDK PNG/JPEG codecs — no external library needed)
  * inside the same mapPartitions contract, and `pngFromDocuments` generates
  * genuine PNG bytes whose pixels follow a doc_id-arithmetic formula, so a
  * SQL oracle can value-check the DECODED pixel statistics (PNG is
  * lossless). The resample is explicit nearest-neighbor — bit-reproducible
  * in any engine, unlike a library's filtered scaler.
  *
  * AUDIO operators are REAL too: `decodeAudio` runs javax.sound.sampled
  * (pure-JDK WAV/AIFF/AU parsing — PCM needs no external codec) and
  * `wavFromDocuments` generates genuine 16-bit PCM WAV bytes whose samples
  * follow a doc_id-arithmetic formula, so the decoded sample-rate /
  * duration / per-channel RMS are SQL-oracle-checkable end to end (PCM is
  * lossless).
  *
  * IMAGE FEATURES are real as well: `imageColorFeatures` extracts the
  * classical color-descriptor vector (per-channel intensity histograms +
  * Rec. 601 mean luminance) from the decoded pixels — genuine features a
  * curation pipeline clusters/near-dups on today, oracle-checked on the
  * formula PNGs.
  *
  * STUB NOTICE (embedding + video-codec stages only): the JDK ships no
  * embedding model and no video codec, so `featureStub` (a stand-in for a
  * LEARNED embedding over any media type) and `frameSampleStub` compute
  * deterministic fakes from the bytes (documented below). The Spark-side
  * plumbing — schema, encoders, partition-preserving iterators, batch
  * shape — is real and is what the tests cover; swapping a fake for
  * ffmpeg/an encoder changes only the function body marked STUB.
  *
  * Scale notes (100 TB): all operators are map-only (no shuffle); binary
  * columns ride Parquet's byte-array encoding and the decode stage streams
  * one partition at a time, so executor memory bounds the largest single
  * object, not the dataset. Partition sizing is controlled by the source
  * (`spark.sql.files.maxPartitionBytes`), and a real pipeline would store
  * media in its own column family / file group to keep text scans pruned.
  */
object Multimodal {

  /** Demo source: derive a deterministic fake binary object per document
    * (32 bytes = unhex(md5(text) twice)). Stands in for a real media column
    * read from Parquet/object storage. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      // deterministic fake type assignment: image/audio/video round-robin
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      unhex(concat(md5(col("text")), md5(concat(lit("2:"), col("text")))))
        .as("content"))

  /** Pixel formula for the generated test images — plain modular arithmetic
    * in (doc_id, x, y) so a SQL oracle recomputes any decoded-pixel
    * statistic exactly. */
  private[graft] def pxR(id: Long, x: Int, y: Int): Int = ((id * 7 + x * 5 + y * 3) % 256).toInt
  private[graft] def pxG(id: Long, x: Int, y: Int): Int = ((id * 11 + x * 3 + y * 7) % 256).toInt
  private[graft] def pxB(id: Long, x: Int, y: Int): Int = ((id * 13 + x + y * 5) % 256).toInt

  /** Media source with REAL image bytes: one RGB PNG per document, encoded
    * by the JDK's own PNG writer. Dimensions w = 4 + id%13, h = 3 + id%11;
    * pixel (x,y) follows [[pxR]]/[[pxG]]/[[pxB]] — all doc_id arithmetic,
    * so the DECODED image is oracle-checkable end to end. */
  def pngFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init, once
      it.map { id =>
        val w = (4 + id % 13).toInt; val h = (3 + id % 11).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (pxR(id, x, y) << 16) | (pxG(id, x, y) << 8) | pxB(id, x, y))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaItem(id, "image", bos.toByteArray)
      }
    }
  }

  /** REAL image decode (javax.imageio — PNG, JPEG, GIF, BMP auto-detected
    * from the bytes): reports dimensions, channel count (color components
    * + alpha if present), and per-channel COLOR means rounded to 4
    * decimals. Single-color-component (grayscale) images report that band
    * in all three means; everything else — including palette-indexed GIFs
    * and alpha-carrying PNGs — is resolved through the color model to RGB
    * first, so the means are always pixel intensities, never palette
    * indices or an alpha band. Undecodable bytes fail loudly — a corrupt
    * image in a curation pipeline is a data bug, not a row to silently
    * skip. */
  def decodeImage(media: Dataset[MediaItem]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init, once
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        require(img != null, s"media_id=${m.media_id}: undecodable image bytes")
        val (w, h) = (img.getWidth, img.getHeight)
        val cm = img.getColorModel
        val channels =
          cm.getNumColorComponents + (if (cm.hasAlpha) 1 else 0)
        val sums = new Array[Long](3)
        // scale factor bringing the accumulated sums onto the 0-255 scale
        // every caller sees, whatever the source bit depth
        var scale = 1.0
        if (cm.getNumColorComponents == 1 &&
            !cm.isInstanceOf[java.awt.image.IndexColorModel]) {
          // true grayscale: the single gray band (alpha, if any, ignored),
          // normalized by the band's bit depth — a 16-bit gray PNG must
          // report the same mean as its 8-bit re-encode, not values ~256x
          // larger than every other image's 0-255 means
          val maxVal = (1L << cm.getComponentSize(0)) - 1
          scale = 255.0 / maxVal
          val raster = img.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = raster.getSample(x, y, 0)
              sums(0) += v; sums(1) += v; sums(2) += v
              x += 1
            }
            y += 1
          }
        } else {
          // everything else through bulk getRGB: the color model resolves
          // palettes/alpha/exotic layouts to 8-bit sRGB — raw raster bands
          // would report palette INDICES for a GIF and the alpha band as
          // avg_b; the bulk row-major form avoids a per-pixel conversion
          // call on megapixel inputs
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            sums(0) += (rgb >> 16) & 0xff
            sums(1) += (rgb >> 8) & 0xff
            sums(2) += rgb & 0xff
            i += 1
          }
        }
        def avg(b: Int): Double = {
          val v = sums(b).toDouble * scale / (w.toLong * h)
          BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        ImageMeta(m.media_id, m.media_type, w, h, channels,
          avg(0), avg(1), avg(2))
      }
    }
  }

  /** REAL image resize: decode (javax.imageio), NEAREST-NEIGHBOR resample
    * to (w, h) — src pixel (floor(x·w0/w), floor(y·h0/h)), the one scaling
    * rule that is bit-reproducible in any engine — and re-encode as PNG.
    * `decodeImage(resizeImage(m, w, h))` therefore reports exactly (w, h)
    * with channel means computable from the source formula. */
  def resizeImage(media: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    require(w > 0 && h > 0 && w <= 16384 && h <= 16384, "bad target dims")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val src = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        require(src != null, s"media_id=${m.media_id}: undecodable image bytes")
        val (w0, h0) = (src.getWidth, src.getHeight)
        val out = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val sy = (y.toLong * h0 / h).toInt
          var x = 0
          while (x < w) {
            out.setRGB(x, y, src.getRGB((x.toLong * w0 / w).toInt, sy))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        MediaItem(m.media_id, m.media_type, bos.toByteArray)
      }
    }
  }

  /** 64-bit DIFFERENCE HASH (dHash) per image — the classical perceptual
    * near-dup fingerprint: decode (real javax.imageio), sample a 9×8
    * grayscale grid with the SAME nearest-neighbor rule as
    * [[resizeImage]] (src pixel (x·w0/9, y·h0/8), integer floor — the
    * one resample that is bit-reproducible in any engine), then bit
    * k = y·8+x is set iff gray(x+1, y) > gray(x, y). Gray is the plain
    * channel sum r+g+b: dHash only ever COMPARES neighboring pixels, so
    * any strictly monotonic luminance proxy yields identical bits, and
    * the integer sum (unlike a weighted Rec. 601 float) keeps the whole
    * hash exact integer math a SQL oracle can replay on the formula
    * PNGs. Map-only; robust to re-encode/resize by construction (the
    * 9×8 grid sees both variants identically when the NN grid maps to
    * the same source pixels). */
  def imageDHash(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // per-partition init, once
      it.map(m => (m.media_id, dHash64(m)))
    }.toDF("media_id", "dhash")
  }

  /** STUBBED image-text alignment gate — the LAION pipeline's CLIP-score
    * stage (keep an image-caption pair iff the towers' cosine clears a
    * threshold). No model runtime exists in this environment, so both
    * towers are deterministic stand-ins: the image tower maps the 64
    * dHash bits (a REAL perceptual signature of the decoded pixels) to
    * a ±1/8 unit vector; the text tower is the hashed bag-of-words
    * embedding ([[TextAnalysis.hashEmbedding]]). The pipeline piece
    * itself — two independently-computed embedding passes, an id-keyed
    * equi-join, score arithmetic, the keep threshold — is exactly what
    * a real CLIP gate runs and swaps onto real towers unchanged.
    * Scores round(4); a zero-norm caption embedding (hashEmbedding's
    * degenerate all-cancelled output) scores −1 and never keeps — the
    * SQ8 zero-vector convention (an unguarded 0/0 would make NaN, which
    * Spark orders ABOVE every number, silently keeping exactly the
    * junk pairs the gate exists to drop). Output
    * (media_id, align_score, keep).
    *
    * In the BATCH path the caption frame is semi-join-restricted to the
    * media ids before the tower runs, so passing a whole-corpus caption
    * table costs only the matched captions' embedding work (measured
    * 2.76× at the sf1 gate without the restriction). A STREAMING media
    * frame can't restrict its static caption side (stream-on-the-right
    * semi-joins are unsupported) — there, pass only the captions you
    * expect to score. */
  def imageTextAlignment(media: Dataset[MediaItem], captions: DataFrame,
                         threshold: Double = 0.0,
                         capIdCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // bit k of the dHash via exact double arithmetic on the 32-bit
    // halves (2^k and the halves are both exact below 2^53; bit 63 of a
    // BIGINT shift would need unsigned care in SQL engines)
    val lo = col("dhash").bitwiseAND(lit(0xffffffffL)).cast("double")
    val hi = shiftrightunsigned(col("dhash"), 32).cast("double")
    val eImg = transform(sequence(lit(0), lit(63)), k => {
      val bit = when(k < 32, pmod(floor(lo / pow(lit(2.0), k)), lit(2.0)))
        .otherwise(pmod(floor(hi / pow(lit(2.0), k - 32)), lit(2.0)))
      when(bit === 1.0, lit(0.125)).otherwise(lit(-0.125))
    })
    val img = imageDHash(media).select(col("media_id"), eImg.as("__iv"))
    val caps =
      if (media.isStreaming || captions.isStreaming) captions
      else captions.join(
        media.toDF().select(col("media_id").as("__mid")),
        col(capIdCol) === col("__mid"), "left_semi")
    val txt = TextAnalysis.hashEmbedding(caps, dims = 64,
        idCol = capIdCol, textCol = textCol)
      .select(col(capIdCol).as("media_id"), col("embedding").as("__tv"))
    // the image vector's norm is exactly 1 (64 components of |x| = 1/8);
    // only the caption side can degenerate to zero
    val tvNorm = Similarity.norm(col("__tv"))
    img.join(txt, "media_id")
      .select(col("media_id"),
        when(tvNorm > 0,
          Similarity.roundZ(Similarity.cosine(col("__iv"), col("__tv")), 4))
          .otherwise(lit(-1.0)).as("align_score"),
        (tvNorm > 0).as("__ok"))
      .select(col("media_id"), col("align_score"),
        (col("__ok") && col("align_score") >= threshold).as("keep"))
  }

  /** One item's 64-bit dHash — the per-row core of [[imageDHash]], exposed
    * so streaming gates can hash while KEEPING the item's columns (a
    * frame-level hash would force a stream-stream join back). Same
    * decode/grid/bit contract as the frame form by construction. */
  def dHash64(m: MediaItem): Long = dHashOf(decodeOf(m))

  private def dHashOf(img: java.awt.image.BufferedImage): Long = {
    val gray = grayGridOf(img, 9, 8)
    var hash = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y)(x + 1) > gray(y)(x)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** Single-decode image profile: (media_id, dhash, area) in ONE decode
    * pass — the cluster → keep-best composition needs both the hash (for
    * pairing) and the real decoded area (for representative selection);
    * composing [[imageDHash]] with [[decodeImage]] would decode every
    * image twice. Hash and dims are bit-identical to the separate
    * operators by construction (shared decode + grid + bit walk). */
  def imageProfile(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = decodeOf(m)
        (m.media_id, dHashOf(img),
          img.getWidth.toLong * img.getHeight)
      }
    }.toDF("media_id", "dhash", "area")
  }

  /** Image CURATION filter — the dimension/aspect gate an image-text
    * corpus runs before any pairing or dedup (LAION-style: tiny images
    * and extreme banners carry no trainable signal): REAL decode once,
    * then verdicts on the pixel dimensions — minimum short side and
    * maximum aspect ratio, the latter compared in the cross-multiplied
    * integer form `long_side · aspectQ <= aspectP · short_side` so the
    * rule is exact in any engine — plus a minimum encoded-byte rule
    * (0 disables; encoded size is encoder-specific, so the byte rule is
    * operator-level only, never oracle-replayed). UNDECODABLE bytes are
    * a REJECT verdict (decode_ok=false, NULL dims, keep=false), never a
    * job failure — a curation gate exists to discard junk, and real
    * crawls always contain truncated fetches (contrast dHash/aHash,
    * where a decode is semantically required and failure must surface).
    * Map-only, one decode per item; composes with the streaming gates
    * unchanged. */
  def imageFilter(media: Dataset[MediaItem], minDim: Int = 6,
                  aspectP: Int = 2, aspectQ: Int = 1,
                  minBytes: Int = 0): DataFrame = {
    import media.sparkSession.implicits._
    require(minDim >= 1 && aspectP >= 1 && aspectQ >= 1 && minBytes >= 0,
      s"bad image filter config ($minDim, $aspectP/$aspectQ, $minBytes)")
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val dims = scala.util.Try(decodeOf(m))
          .toOption.map(i => (i.getWidth.toLong, i.getHeight.toLong))
        (m.media_id, dims.map(_._1), dims.map(_._2),
          m.content.length.toLong, dims.isDefined)
      }
    }.toDF("media_id", "width", "height", "n_bytes", "decode_ok")
      .withColumn("dim_ok", col("decode_ok") &&
        least(col("width"), col("height")) >= minDim)
      .withColumn("aspect_ok", col("decode_ok") &&
        greatest(col("width"), col("height")) * aspectQ <=
          least(col("width"), col("height")) * aspectP)
      .withColumn("bytes_ok", col("n_bytes") >= minBytes)
      .withColumn("keep",
        col("dim_ok") && col("aspect_ok") && col("bytes_ok"))
  }

  /** 64-bit AVERAGE HASH (aHash) per image — [[imageDHash]]'s sibling
    * perceptual fingerprint (brightness-profile instead of gradient-
    * profile; pipelines run both because they fail differently): 8×8 NN
    * grayscale grid, bit k = y·8+x set iff the cell is STRICTLY brighter
    * than the grid mean — compared in the cross-multiplied integer form
    * 64·gray(x,y) > Σ gray, exact in any engine (no float mean). Same
    * decode/grid contract as dHash; map-only. */
  def imageAHash(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val gray = grayGrid(m, 8, 8)
        var total = 0L
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { total += gray(y)(x); x += 1 }
          y += 1
        }
        var hash = 0L
        y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            if (64L * gray(y)(x) > total) hash |= 1L << (y * 8 + x)
            x += 1
          }
          y += 1
        }
        (m.media_id, hash)
      }
    }.toDF("media_id", "ahash")
  }

  /** The decoded gw×gh nearest-neighbor grayscale grid both perceptual
    * hashes sample — ONE definition of the decode + NN mapping
    * (src pixel (x·w0/gw, y·h0/gh), integer floor — [[resizeImage]]'s
    * rule) and the integer gray = r+g+b so dHash and aHash can never
    * drift. Indexed gray(y)(x). */
  private def decodeOf(m: MediaItem): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(m.content))
    require(img != null, s"media_id=${m.media_id}: undecodable image bytes")
    img
  }

  private def grayGrid(m: MediaItem, gw: Int, gh: Int): Array[Array[Int]] =
    grayGridOf(decodeOf(m), gw, gh)

  private def grayGridOf(img: java.awt.image.BufferedImage, gw: Int,
                         gh: Int): Array[Array[Int]] = {
    val (w0, h0) = (img.getWidth, img.getHeight)
    val gray = Array.ofDim[Int](gh, gw)
    var y = 0
    while (y < gh) {
      val sy = (y.toLong * h0 / gh).toInt
      var x = 0
      while (x < gw) {
        val sx = (x.toLong * w0 / gw).toInt
        val rgb = img.getRGB(sx, sy)
        gray(y)(x) =
          ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    gray
  }

  /** IMAGE NEAR-DUP pairs: [[imageDHash]] + Hamming BANDING for candidate
    * generation — the multimodal face of the dedup mandate. The 64-bit
    * hash splits into four disjoint 16-bit bands; by pigeonhole, two
    * hashes within Hamming distance ≤ 3 differ in at most 3 bands, so
    * they AGREE exactly on at least one — candidates come from a banded
    * EQUI-join (never all-pairs, the `minhashLsh` contract), and at
    * `maxHamming` ≤ 3 the result is EXACTLY the all-pairs answer (the
    * property the oracle exploits). Thresholds above 3 keep the banding
    * but lose the completeness guarantee — the standard LSH recall
    * trade, so the parameter is capped instead of silently weakened.
    *
    * Shape at 100 TB: hashing is map-only; the candidate join shuffles
    * on (band, 16-bit value) — 4 rows per image against ≤ 65536 buckets
    * per band, with content-clustered (not adversarial) skew; the pair
    * dedup rides a (id_a, id_b)-keyed aggregation (uniform keys) and
    * verification is one bit_count(xor) per candidate. */
  def imageNearDup(media: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    Similarity.hamming64NearDup(imageDHash(media), maxHamming,
      idCol = "media_id", hashCol = "dhash")

  /** 64-bit AUDIO FINGERPRINT per (media, channel) from REAL PCM decode —
    * the waveform analog of [[imageDHash]]: bit i is set iff
    * sample(i+1) > sample(i) on that channel (the delta-sign profile —
    * robust to gain changes, which scale but never reorder samples);
    * clips shorter than 65 frames leave the tail bits 0. Same
    * [[decodePcm]] contract as the other audio operators, map-only,
    * integer-exact for a SQL oracle on the formula WAVs. */
  def audioFingerprint(media: Dataset[MediaItem]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val pcm = decodePcm(m)
        (0 until pcm.ch).map { c =>
          var hash = 0L
          var i = 0
          val steps = math.max(0, math.min(64, pcm.frames - 1))
          while (i < steps) {
            if (pcm.sample(i + 1, c) > pcm.sample(i, c)) hash |= 1L << i
            i += 1
          }
          (m.media_id, c, hash)
        }
      }
    }.toDF("media_id", "channel", "fp")
  }

  /** AUDIO NEAR-DUP pairs: [[audioFingerprint]] on channel 0 (the
    * mixdown convention) + the shared Hamming banding
    * (`Similarity.hamming64NearDup` — the exact contract
    * [[imageNearDup]] uses: banded equi-join candidates,
    * pigeonhole-complete at Hamming ≤ 3). */
  def audioNearDup(media: Dataset[MediaItem], maxHamming: Int = 3): DataFrame =
    Similarity.hamming64NearDup(
      audioFingerprint(media).where(col("channel") === 0)
        .select(col("media_id"), col("fp")),
      maxHamming, idCol = "media_id", hashCol = "fp")

  /** Sample formula for the generated test WAVs — modular arithmetic in
    * (doc_id, channel, frame) with values in [-1000, 1000], so a SQL
    * oracle recomputes any decoded-sample statistic exactly. */
  private[graft] def pcmSample(id: Long, c: Int, s: Int): Int =
    (((id * 7 + c.toLong * 13 + s.toLong * 31) % 2001) - 1000).toInt

  /** Media source with REAL audio bytes: one 16-bit PCM WAV per document,
    * encoded by the JDK's own WAV writer (javax.sound.sampled). Layout is
    * doc_id arithmetic — sample rate 8000 + (id%3)·4000 Hz, channels
    * 1 + id%2, frames 50 + id%101 — and frame s of channel c follows
    * [[pcmSample]], so the DECODED audio is oracle-checkable end to end. */
  def wavFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = (8000 + (id % 3) * 4000).toInt
        val ch = (1 + id % 2).toInt
        val frames = (50 + id % 101).toInt
        val raw = new Array[Byte](frames * ch * 2)
        var s = 0
        while (s < frames) {
          var c = 0
          while (c < ch) {
            val v = pcmSample(id, c, s)
            val off = (s * ch + c) * 2
            raw(off) = (v & 0xff).toByte            // little-endian PCM
            raw(off + 1) = ((v >> 8) & 0xff).toByte
            c += 1
          }
          s += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, ch, true, false)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(raw), fmt, frames.toLong),
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaItem(id, "audio", bos.toByteArray)
      }
    }
  }

  /** REAL audio decode (javax.sound.sampled — WAV/AIFF/AU containers,
    * 8/16-bit integer PCM): reports the header facts every audio pipeline
    * keys on (sample rate, channels, bit depth, frame count, duration in
    * seconds round(6)) plus per-channel RMS amplitude round(4) — the
    * loudness statistic quality filters threshold on. Only the first two
    * channels report RMS (>2-channel audio keeps its header facts); mono
    * mirrors its single channel into both columns. Undecodable bytes fail
    * loudly — a corrupt clip in a curation pipeline is a data bug, not a
    * row to silently skip. */
  /** ONE definition of the PCM decode contract [[decodeAudio]] and
    * [[audioFeatures]] share: javax.sound stream open, the signed
    * 8/16-bit PCM requirement, the byte drain, and the endian-aware
    * per-(frame, channel) sample extractor. */
  private final case class Pcm(fmt: javax.sound.sampled.AudioFormat,
                               bits: Int, ch: Int, frames: Int,
                               sample: (Int, Int) => Int)

  private def decodePcm(m: MediaItem): Pcm = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(m.content))
    val fmt = ais.getFormat
    val bits = fmt.getSampleSizeInBits
    require(fmt.getEncoding ==
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        (bits == 8 || bits == 16),
      s"media_id=${m.media_id}: only 8/16-bit signed PCM is decoded " +
        s"(got ${fmt.getEncoding}/$bits-bit)")
    val ch = fmt.getChannels
    val bytes = {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = ais.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = ais.read(chunk) }
      buf.toByteArray
    }
    val bps = bits / 8
    val frames = bytes.length / (bps * ch)
    def sample(s: Int, c: Int): Int = {
      val off = (s * ch + c) * bps
      if (bits == 8) bytes(off).toInt
      else if (fmt.isBigEndian)
        (bytes(off) << 8) | (bytes(off + 1) & 0xff)
      else (bytes(off + 1) << 8) | (bytes(off) & 0xff)
    }
    Pcm(fmt, bits, ch, frames, sample)
  }

  def decodeAudio(media: Dataset[MediaItem]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val pcm = decodePcm(m)
        val fmt = pcm.fmt
        val bits = pcm.bits
        val ch = pcm.ch
        val frames = pcm.frames
        val sumSq = new Array[Double](math.min(ch, 2))
        var s = 0
        while (s < frames) {
          var c = 0
          while (c < math.min(ch, 2)) {
            val v = pcm.sample(s, c)
            sumSq(c) += v.toDouble * v
            c += 1
          }
          s += 1
        }
        def rms(c: Int): Double = {
          val i = math.min(c, sumSq.length - 1) // mono mirrors channel 0
          val v = math.sqrt(sumSq(i) / math.max(1, frames))
          BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
        val rate = math.round(fmt.getSampleRate)
        val dur = BigDecimal(frames.toDouble / rate)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        AudioMeta(m.media_id, m.media_type, rate, ch, bits,
          frames.toLong, dur, rms(0), rms(1))
      }
    }
  }

  /** REAL audio feature extraction over `javax.sound` PCM decode — one
    * row per (media, channel) with RMS, zero-crossing rate (sign flips
    * between consecutive samples / (frames−1); a strict `product < 0`
    * rule so zero samples break no crossing — the convention the
    * oracle replays exactly), and the peak absolute amplitude. The
    * signal-quality columns ("is this clip silence / clipping /
    * noise") a speech-data curation pass filters on. rms/zcr round(4).
    * Single-frame clips report zcr 0 (no pair to cross). Same
    * mapPartitions batch shape and PCM contract as [[decodeAudio]]. */
  def audioFeatures(media: Dataset[MediaItem]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val pcm = decodePcm(m)
        val ch = pcm.ch
        val frames = pcm.frames
        (0 until ch).map { c =>
          var sumSq = 0.0
          var flips = 0L
          var peak = 0L
          var prev = 0
          var s = 0
          while (s < frames) {
            val v = pcm.sample(s, c)
            sumSq += v.toDouble * v
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            if (s > 0 && prev.toLong * v < 0) flips += 1
            prev = v
            s += 1
          }
          def r4(x: Double) = BigDecimal(x)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          AudioFeatures(m.media_id, c,
            r4(math.sqrt(sumSq / math.max(1, frames))),
            if (frames > 1) r4(flips.toDouble / (frames - 1)) else 0.0,
            peak)
        }
      }
    }
  }

  /** STUB decode: reads a fake header from the first bytes instead of a real
    * codec. width = b0*256+b1, height = b2*256+b3, channels = 1 + (b4 % 4).
    * Deterministic in the bytes; kept for the NON-image media types the JDK
    * cannot decode (see decodeImage for the real PNG/JPEG path). */
  def decodeStub(media: Dataset[MediaItem]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init (a real impl would create the decoder here, once)
      it.map { m =>
        val b = m.content
        def u(i: Int): Int = if (i < b.length) b(i) & 0xff else 0
        MediaMeta(m.media_id, m.media_type,
          width = u(0) * 256 + u(1), height = u(2) * 256 + u(3),
          channels = 1 + (u(4) % 4), n_bytes = b.length.toLong)
      }
    }
  }

  /** REAL image feature extractor (javax.imageio): the classical
    * color-descriptor vector — normalized per-channel intensity
    * histograms (`bins` buckets per R/G/B channel, bucket = value·bins/256
    * over the color-model-resolved pixels) plus mean luminance (Rec. 601:
    * 0.299R + 0.587G + 0.114B, scaled to [0,1]) — dims = 3·bins + 1.
    * NOT a learned embedding (the STUB notice above still covers that
    * stage); these are genuine decoded-pixel features a curation pipeline
    * can cluster, near-dup, or stratify on today, oracle-checkable on the
    * formula-pixel PNGs. Same mapPartitions contract as [[decodeImage]];
    * undecodable bytes fail loudly. */
  def imageColorFeatures(media: Dataset[MediaItem],
                         bins: Int = 4): Dataset[MediaFeature] = {
    require(bins >= 1 && bins <= 256, s"bins out of [1,256]: $bins")
    import media.sparkSession.implicits._
    media.filter(_.media_type == "image").mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.content))
        require(img != null, s"undecodable image bytes: media_id ${m.media_id}")
        val w = img.getWidth; val h = img.getHeight
        val hist = Array.ofDim[Long](3, bins)
        var lumSum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            hist(0)(r * bins / 256) += 1
            hist(1)(g * bins / 256) += 1
            hist(2)(b * bins / 256) += 1
            lumSum += 0.299 * r + 0.587 * g + 0.114 * b
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        val v = new Array[Float](3 * bins + 1)
        var c = 0
        while (c < 3) {
          var k = 0
          while (k < bins) {
            v(c * bins + k) = (hist(c)(k) / n).toFloat; k += 1
          }
          c += 1
        }
        v(3 * bins) = (lumSum / n / 255.0).toFloat
        MediaFeature(m.media_id, v)
      }
    }
  }

  /** STUB feature extractor: 8-dim float vector, dim d = mean of bytes
    * congruent to d mod 8, scaled to [0,1). A real embedding model would
    * replace the body; the per-partition batch shape stays identical. */
  def featureStub(media: Dataset[MediaItem], dims: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val sums = new Array[Long](dims); val cnts = new Array[Long](dims)
        var i = 0
        while (i < m.content.length) {
          val d = i % dims; sums(d) += m.content(i) & 0xff; cnts(d) += 1; i += 1
        }
        val v = Array.tabulate(dims)(d =>
          if (cnts(d) == 0) 0f else (sums(d).toFloat / cnts(d) / 256f))
        MediaFeature(m.media_id, v)
      }
    }
  }

  /** STUB frame sampler: every video yields `n` "frames", each an 8-byte
    * slice of the content starting at frame_idx*4 (wrapping). Real frame
    * extraction replaces the slice with a codec call; the flatMap shape
    * (0..n rows out per row in) is the real contract. */
  def frameSampleStub(media: Dataset[MediaItem], n: Int = 4): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.media_type == "video").flatMap { m =>
      (0 until n).iterator.map { f =>
        val start = (f * 4) % math.max(1, m.content.length)
        val slice = m.content.slice(start, math.min(start + 8, m.content.length))
        MediaFrame(m.media_id, f, slice)
      }
    }
  }

  /** Typed view of a multimodal DataFrame (media_id, media_type, content). */
  def asItems(df: DataFrame): Dataset[MediaItem] = {
    import df.sparkSession.implicits._
    df.select("media_id", "media_type", "content").as[MediaItem]
  }
}
