package graft.queries

import graft.QSpec
import graft.QSpec._
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline as oracle-checked queries. Image decode and
  * resize are REAL (javax.imageio over generated formula-pixel PNGs —
  * lossless, so DuckDB value-checks the decoded pixel statistics by
  * recomputing the arithmetic), and audio decode is REAL too
  * (javax.sound.sampled over generated formula-waveform 16-bit PCM WAVs —
  * the oracle recomputes rate/duration/per-channel RMS exactly). The
  * embedding-feature and video-frame operators remain deterministic
  * md5-derived fakes (the JDK ships no embedding model or video codec),
  * equally value-checkable by replaying the arithmetic on the hex text. */
object MultimodalQueries {

  /** DuckDB: value of hex digit k (1-based) of string h. */
  private def hv(k: String) = s"(strpos('0123456789abcdef', substring(h, $k, 1)) - 1)"
  /** DuckDB: unsigned byte i (0-based) of hex string h. */
  private def byteAt(i: String) = s"(${hv(s"($i)*2+1")} * 16 + ${hv(s"($i)*2+2")})"


  /** Shared DuckDB CTE chain: per-image 64-bit dHash over the formula
    * PNGs, split into (hi, lo) 32-bit halves so the bit arithmetic never
    * touches BIGINT bit 63 — the 9x8 nearest-neighbor grayscale grid
    * (gray = r+g+b, integer-exact) and the horizontal-gradient bit walk
    * mirror Multimodal.imageDHash exactly. Ends at h(media_id, hi, lo). */
  private val duckDHashChain =
    """m AS (SELECT doc_id AS media_id,
      |    4 + doc_id % 13 AS w0, 3 + doc_id % 11 AS h0
      |  FROM documents ORDER BY media_id LIMIT 150),
      |g AS (SELECT media_id, x, y,
      |    ((media_id * 7 + sx * 5 + sy * 3) % 256)
      |  + ((media_id * 11 + sx * 3 + sy * 7) % 256)
      |  + ((media_id * 13 + sx + sy * 5) % 256) AS gray
      |  FROM (SELECT media_id, x, y,
      |      x * w0 // 9 AS sx, y * h0 // 8 AS sy
      |    FROM m CROSS JOIN generate_series(0, 8) tx(x)
      |           CROSS JOIN generate_series(0, 7) ty(y)) z),
      |hb AS (SELECT a.media_id, a.y * 8 + a.x AS k,
      |    CASE WHEN b.gray > a.gray THEN 1 ELSE 0 END AS bit
      |  FROM g a JOIN g b ON b.media_id = a.media_id
      |    AND b.y = a.y AND b.x = a.x + 1
      |  WHERE a.x < 8),
      |h AS (SELECT media_id,
      |    CAST(sum(CASE WHEN k >= 32
      |      THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) AS BIGINT) AS hi,
      |    CAST(sum(CASE WHEN k < 32
      |      THEN bit * (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS lo
      |  FROM hb GROUP BY media_id)""".stripMargin

  val all: Seq[QSpec] = Seq(

    df("mm_attach_binary",
      """SELECT doc_id AS media_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |  octet_length(unhex(concat(md5(text), md5(concat('2:', text))))) AS n_bytes
        |FROM documents ORDER BY media_id LIMIT 100""".stripMargin) { (s, _) =>
      Multimodal.fromDocuments(s.table("documents"))
        .select(col("media_id"), col("media_type"),
          length(col("content")).cast("long").as("n_bytes"))
        .orderBy("media_id").limit(100)
    },

    // REAL image decode: the source generates genuine PNGs whose pixels are
    // doc_id arithmetic, so the oracle value-checks what javax.imageio
    // actually DECODED — dims, channel count, and per-channel pixel means
    // (PNG is lossless, so decode must reproduce the formula exactly)
    df("mm_decode",
      """WITH m AS (SELECT doc_id AS media_id,
        |    4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
        |  FROM documents ORDER BY media_id LIMIT 100),
        |px AS (SELECT media_id, w, h, x, y,
        |    (media_id * 7 + x * 5 + y * 3) % 256 AS r,
        |    (media_id * 11 + x * 3 + y * 7) % 256 AS g,
        |    (media_id * 13 + x + y * 5) % 256 AS b
        |  FROM m CROSS JOIN generate_series(0, 16) tx(x)
        |         CROSS JOIN generate_series(0, 13) ty(y)
        |  WHERE x < w AND y < h)
        |SELECT media_id, 'image' AS media_type, w AS width, h AS height,
        |  3 AS channels, round(avg(r), 4) AS avg_r,
        |  round(avg(g), 4) AS avg_g, round(avg(b), 4) AS avg_b
        |FROM px GROUP BY media_id, w, h ORDER BY media_id""".stripMargin) { (s, _) =>
      Multimodal.decodeImage(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)))
        .toDF()
        // int64 dims: DuckDB arithmetic yields BIGINT and the driver
        // hash is type-sensitive
        .withColumn("width", col("width").cast("long"))
        .withColumn("height", col("height").cast("long"))
        .orderBy("media_id")
    },

    // REAL resize: decode → nearest-neighbor resample to 8x6 → PNG
    // re-encode → decode again; the oracle replays the NN source-pixel
    // mapping floor(x·w0/8), floor(y·h0/6) on the formula pixels
    df("mm_resize",
      """WITH m AS (SELECT doc_id AS media_id,
        |    4 + doc_id % 13 AS w0, 3 + doc_id % 11 AS h0
        |  FROM documents ORDER BY media_id LIMIT 100),
        |px AS (SELECT media_id,
        |    CAST(floor(x * w0 / 8.0) AS BIGINT) AS sx,
        |    CAST(floor(y * h0 / 6.0) AS BIGINT) AS sy
        |  FROM m CROSS JOIN generate_series(0, 7) tx(x)
        |         CROSS JOIN generate_series(0, 5) ty(y))
        |SELECT media_id, 'image' AS media_type, 8 AS width, 6 AS height,
        |  3 AS channels,
        |  round(avg((media_id * 7 + sx * 5 + sy * 3) % 256), 4) AS avg_r,
        |  round(avg((media_id * 11 + sx * 3 + sy * 7) % 256), 4) AS avg_g,
        |  round(avg((media_id * 13 + sx + sy * 5) % 256), 4) AS avg_b
        |FROM px GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, _) =>
      Multimodal.decodeImage(Multimodal.resizeImage(
          Multimodal.pngFromDocuments(
            s.table("documents").orderBy("doc_id").limit(100)), w = 8, h = 6))
        .toDF().orderBy("media_id")
    },

    // REAL audio decode: the source generates genuine 16-bit PCM WAVs
    // whose samples are doc_id arithmetic, so the oracle value-checks what
    // javax.sound.sampled actually DECODED — rate, channels, frame count,
    // duration, and per-channel RMS (PCM is lossless: decode must
    // reproduce the formula exactly)
    df("mm_audio_decode",
      """WITH m AS (SELECT doc_id AS media_id,
        |    8000 + (doc_id % 3) * 4000 AS rate,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    50 + doc_id % 101 AS frames
        |  FROM documents ORDER BY media_id LIMIT 100),
        |sm AS (SELECT media_id, c,
        |    CAST((media_id * 7 + c * 13 + s * 31) % 2001 - 1000 AS DOUBLE) AS v
        |  FROM m CROSS JOIN generate_series(0, 149) ts(s)
        |         CROSS JOIN generate_series(0, 1) tc(c)
        |  WHERE s < frames AND c < ch),
        |r AS (SELECT media_id, c, round(sqrt(avg(v * v)), 4) AS rms
        |  FROM sm GROUP BY media_id, c)
        |SELECT m.media_id, 'audio' AS media_type, rate AS sample_rate,
        |  ch AS channels, 16 AS bits, frames AS n_frames,
        |  round(frames / CAST(rate AS DOUBLE), 6) AS duration_s,
        |  max(CASE WHEN c = 0 THEN rms END) AS rms_c0,
        |  coalesce(max(CASE WHEN c = 1 THEN rms END),
        |           max(CASE WHEN c = 0 THEN rms END)) AS rms_c1
        |FROM m JOIN r ON m.media_id = r.media_id
        |GROUP BY m.media_id, rate, ch, frames
        |ORDER BY m.media_id""".stripMargin) { (s, _) =>
      Multimodal.decodeAudio(Multimodal.wavFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)))
        .toDF()
        .withColumn("sample_rate", col("sample_rate").cast("long"))
        .orderBy("media_id")
    },

    // REAL audio features: RMS + zero-crossing rate + peak per channel
    // over the DECODED PCM; the oracle replays the sample formula with
    // the identical strict product<0 crossing rule
    df("mm_audio_features",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(1 + doc_id % 2 AS INT) AS ch,
        |    50 + doc_id % 101 AS frames
        |  FROM documents ORDER BY media_id LIMIT 100),
        |sm AS (SELECT media_id, c, s,
        |    CAST((media_id * 7 + c * 13 + s * 31) % 2001 - 1000 AS DOUBLE) AS v
        |  FROM m CROSS JOIN generate_series(0, 149) ts(s)
        |         CROSS JOIN generate_series(0, 1) tc(c)
        |  WHERE s < frames AND c < ch),
        |lg AS (SELECT media_id, c, v,
        |    lag(v) OVER (PARTITION BY media_id, c ORDER BY s) AS pv
        |  FROM sm),
        |f AS (SELECT media_id, c,
        |  round(sqrt(avg(v * v)), 4) AS rms,
        |  round(CAST(sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
        |      THEN 1 ELSE 0 END) AS DOUBLE) / (count(*) - 1), 4) AS zcr,
        |  CAST(max(abs(v)) AS BIGINT) AS peak_abs
        |  FROM lg GROUP BY 1, 2)
        |SELECT media_id, CAST(c AS INT) AS channel, rms, zcr, peak_abs
        |FROM f ORDER BY media_id, channel""".stripMargin) { (s, _) =>
      Multimodal.audioFeatures(Multimodal.wavFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)))
        .toDF().orderBy("media_id", "channel")
    },

    // REAL image features: per-channel 4-bin intensity histograms + mean
    // luminance over the DECODED formula-pixel PNGs — the oracle replays
    // the pixel arithmetic (bin = value*4//256, Rec. 601 luminance);
    // exploded to (media_id, dim, v) rows like every feature query
    df("mm_image_features",
      """WITH m AS (SELECT doc_id AS media_id,
        |    4 + doc_id % 13 AS w, 3 + doc_id % 11 AS h
        |  FROM documents ORDER BY media_id LIMIT 100),
        |px AS (SELECT media_id, w, h,
        |    (media_id * 7 + x * 5 + y * 3) % 256 AS r,
        |    (media_id * 11 + x * 3 + y * 7) % 256 AS g,
        |    (media_id * 13 + x + y * 5) % 256 AS b
        |  FROM m CROSS JOIN generate_series(0, 16) tx(x)
        |         CROSS JOIN generate_series(0, 13) ty(y)
        |  WHERE x < w AND y < h),
        |hist AS (
        |  SELECT media_id, 0 AS c, r * 4 // 256 AS k, count(*) AS n
        |    FROM px GROUP BY 1, 2, 3
        |  UNION ALL SELECT media_id, 1, g * 4 // 256, count(*)
        |    FROM px GROUP BY 1, 2, 3
        |  UNION ALL SELECT media_id, 2, b * 4 // 256, count(*)
        |    FROM px GROUP BY 1, 2, 3),
        |tot AS (SELECT media_id, w * h AS n FROM m),
        |lum AS (SELECT media_id,
        |    avg(0.299 * r + 0.587 * g + 0.114 * b) / 255 AS v
        |  FROM px GROUP BY media_id),
        |dims AS (SELECT media_id, d
        |  FROM m CROSS JOIN generate_series(0, 12) t(d))
        |SELECT dims.media_id, dims.d AS dim,
        |  CAST(CASE WHEN dims.d = 12 THEN lum.v
        |    ELSE coalesce(hist.n, 0) / CAST(tot.n AS DOUBLE) END AS FLOAT)
        |    AS v
        |FROM dims JOIN tot ON tot.media_id = dims.media_id
        |  JOIN lum ON lum.media_id = dims.media_id
        |  LEFT JOIN hist ON hist.media_id = dims.media_id
        |    AND hist.c = dims.d // 4 AND hist.k = dims.d % 4
        |ORDER BY dims.media_id, dim""".stripMargin) { (s, _) =>
      // BOTH sides emit float32 of the same double: bit-identical cells
      // (a double round(6) still diverged where float32 noise straddled
      // the decimal boundary — 3/1300 cells in the first cut)
      Multimodal.imageColorFeatures(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)), bins = 4)
        .toDF()
        .select(col("media_id"), posexplode(col("feature")).as(Seq("dim", "v")))
        .withColumn("dim", col("dim").cast("long"))
        .orderBy("media_id", "dim")
    },

    // feature vector exploded to (media_id, dim, v) rows: the driver's
    // comparator sorts + hashes cell values and cannot handle top-level
    // arrays, and per-cell doubles get its float normalization for free
    df("mm_feature_stub",
      s"""WITH hx AS (SELECT doc_id, concat(md5(text), md5(concat('2:', text))) AS h
         |  FROM documents ORDER BY doc_id LIMIT 100),
         |bytes AS (SELECT doc_id, i, ${byteAt("i")} AS b
         |  FROM hx CROSS JOIN generate_series(0, 31) t(i)),
         |f AS (SELECT doc_id, i % 8 AS d, avg(b) / 256 AS v
         |  FROM bytes GROUP BY doc_id, i % 8)
         |SELECT doc_id AS media_id, d AS dim, v
         |FROM f ORDER BY media_id, dim""".stripMargin) { (s, _) =>
      Multimodal.featureStub(Multimodal.asItems(
          Multimodal.fromDocuments(s.table("documents"))), dims = 8)
        .toDF().orderBy("media_id").limit(100)
        .select(col("media_id"), posexplode(col("feature")).as(Seq("dim", "v")))
        .withColumn("dim", col("dim").cast("long"))
        // exact: stub values are dyadic rationals (sum/4/256), so the
        // float->double widening is lossless and matches the oracle's
        // native DOUBLE
        .withColumn("v", col("v").cast("double"))
        .orderBy("media_id", "dim")
    },


    // image curation filter: min short side + max aspect ratio over REAL
    // decoded dimensions (the oracle derives the same dims from the PNG
    // fixture's construction formula; the rules are exact integer forms)
    df("mm_image_filter",
      """WITH m AS (SELECT doc_id AS media_id,
        |    4 + doc_id % 13 AS w0, 3 + doc_id % 11 AS h0
        |  FROM documents ORDER BY media_id LIMIT 150)
        |SELECT media_id, CAST(w0 AS BIGINT) AS width,
        |  CAST(h0 AS BIGINT) AS height, true AS decode_ok,
        |  (least(w0, h0) >= 6) AS dim_ok,
        |  (greatest(w0, h0) * 1 <= least(w0, h0) * 2) AS aspect_ok,
        |  (least(w0, h0) >= 6
        |    AND greatest(w0, h0) * 1 <= least(w0, h0) * 2) AS keep
        |FROM m ORDER BY media_id""".stripMargin) { (s, _) =>
      Multimodal.imageFilter(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)))
        .select("media_id", "width", "height", "decode_ok", "dim_ok",
          "aspect_ok", "keep")
        .orderBy("media_id")
    },

    // 64-bit perceptual dHash over REAL decoded PNGs: the oracle replays
    // the 9x8 NN grayscale grid + gradient bit walk as integer math on
    // the pixel formula; hash split hi/lo so no engine touches bit 63
    df("mm_image_dhash",
      s"""WITH $duckDHashChain
        |SELECT media_id, hi AS dhash_hi, lo AS dhash_lo
        |FROM h ORDER BY media_id""".stripMargin) { (s, _) =>
      Multimodal.imageDHash(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)))
        .select(col("media_id"),
          shiftrightunsigned(col("dhash"), 32).as("dhash_hi"),
          col("dhash").bitwiseAND(lit(0xffffffffL)).as("dhash_lo"))
        .orderBy("media_id")
    },

    // image near-dup pairs: dHash + 4x16-bit Hamming banding. At
    // maxHamming <= 3 the banded equi-join is pigeonhole-COMPLETE, so
    // the oracle may verify with a plain all-pairs join (150 images)
    // while the Spark plan never goes all-pairs (PlanSpec-pinned)
    df("mm_image_dedup",
      s"""WITH $duckDHashChain
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi))
        |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, _) =>
      Multimodal.imageNearDup(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)), maxHamming = 3)
        .orderBy("id_a", "id_b")
    },


    // image-text alignment gate (the LAION CLIP-score stage, towers
    // stubbed deterministically — dHash-bit image vector x hashed
    // bag-of-words caption vector): the oracle composes the two proven
    // chains (formula-pixel dHash + md5 feature hashing) and replays the
    // cosine + threshold
    df("mm_text_alignment",
      s"""WITH $duckDHashChain,
        |iv AS (SELECT media_id, list_transform(generate_series(0, 63), k ->
        |  CASE WHEN (CASE WHEN k < 32 THEN (lo // (1::BIGINT << k)) % 2
        |    ELSE (hi // (1::BIGINT << (k - 32))) % 2 END) = 1
        |  THEN 0.125 ELSE -0.125 END) AS iv FROM h),
        |${DuckOracles.hashEmbedding64},
        |tv AS (SELECT doc_id AS media_id, embedding AS tv FROM hemb),
        |sc AS (SELECT media_id,
        |  CASE WHEN sqrt(list_sum(list_transform(tv, x -> x * x))) > 0
        |    THEN round(
        |      list_sum(list_transform(generate_series(1, 64), i -> iv[i] * tv[i]))
        |      / (sqrt(list_sum(list_transform(iv, x -> x * x)))
        |       * sqrt(list_sum(list_transform(tv, x -> x * x)))) * 10000)::BIGINT
        |      / 10000.0
        |    ELSE -1.0 END AS align_score,
        |  (sqrt(list_sum(list_transform(tv, x -> x * x))) > 0) AS ok
        |  FROM iv JOIN tv USING (media_id))
        |SELECT media_id, align_score, (ok AND align_score >= 0.0) AS keep
        |FROM sc ORDER BY media_id""".stripMargin) { (s, _) =>
      // captions restricted to the fixture's 150 docs — the id-keyed
      // join restricts to them anyway (result-identical to passing the
      // whole table, and the oracle's full-corpus hemb chain joins down
      // to the same rows), but the caption tower then embeds only the
      // matched captions: the production shape, scale-flat in the gate
      Multimodal.imageTextAlignment(
          Multimodal.pngFromDocuments(
            s.table("documents").orderBy("doc_id").limit(150)),
          s.table("documents").orderBy("doc_id").limit(150),
          threshold = 0.0)
        .orderBy("media_id")
    },

    // average hash (aHash), dHash's sibling fingerprint: 8x8 grid, bit =
    // cell strictly brighter than the grid mean, compared integer-exactly
    // as 64*gray > total (no float mean on either engine)
    df("mm_image_ahash",
      """WITH m AS (SELECT doc_id AS media_id,
        |    4 + doc_id % 13 AS w0, 3 + doc_id % 11 AS h0
        |  FROM documents ORDER BY media_id LIMIT 150),
        |g AS (SELECT media_id, y * 8 + x AS k,
        |    ((media_id * 7 + sx * 5 + sy * 3) % 256)
        |  + ((media_id * 11 + sx * 3 + sy * 7) % 256)
        |  + ((media_id * 13 + sx + sy * 5) % 256) AS gray
        |  FROM (SELECT media_id, x, y, x * w0 // 8 AS sx, y * h0 // 8 AS sy
        |    FROM m CROSS JOIN generate_series(0, 7) tx(x)
        |           CROSS JOIN generate_series(0, 7) ty(y)) z),
        |t AS (SELECT media_id, CAST(sum(gray) AS BIGINT) AS total
        |  FROM g GROUP BY media_id),
        |hb AS (SELECT g.media_id, k,
        |    CASE WHEN 64 * gray > total THEN 1 ELSE 0 END AS bit
        |  FROM g JOIN t ON t.media_id = g.media_id)
        |SELECT media_id,
        |  CAST(sum(CASE WHEN k >= 32
        |    THEN bit * (1::BIGINT << (k - 32)) ELSE 0 END) AS BIGINT) AS ahash_hi,
        |  CAST(sum(CASE WHEN k < 32
        |    THEN bit * (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS ahash_lo
        |FROM hb GROUP BY media_id ORDER BY media_id""".stripMargin) { (s, _) =>
      Multimodal.imageAHash(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)))
        .select(col("media_id"),
          shiftrightunsigned(col("ahash"), 32).as("ahash_hi"),
          col("ahash").bitwiseAND(lit(0xffffffffL)).as("ahash_lo"))
        .orderBy("media_id")
    },

    // 64-bit audio fingerprint from REAL PCM decode: per channel, bit i =
    // sample(i+1) > sample(i) (delta-sign profile, gain-invariant); the
    // oracle replays the waveform formula's comparisons exactly
    df("mm_audio_fingerprint",
      """WITH m AS (SELECT doc_id AS media_id,
        |    CAST(1 + doc_id % 2 AS INT) AS ch, 50 + doc_id % 101 AS frames
        |  FROM documents ORDER BY media_id LIMIT 100),
        |b AS (SELECT media_id, c, i,
        |    CASE WHEN (media_id * 7 + c * 13 + (i + 1) * 31) % 2001
        |            > (media_id * 7 + c * 13 + i * 31) % 2001
        |      THEN 1 ELSE 0 END AS bit
        |  FROM m CROSS JOIN generate_series(0, 63) t(i)
        |         CROSS JOIN generate_series(0, 1) tc(c)
        |  WHERE c < ch AND i < frames - 1)
        |SELECT media_id, CAST(c AS INT) AS channel,
        |  CAST(sum(CASE WHEN i >= 32
        |    THEN bit * (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS fp_hi,
        |  CAST(sum(CASE WHEN i < 32
        |    THEN bit * (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS fp_lo
        |FROM b GROUP BY media_id, c
        |ORDER BY media_id, channel""".stripMargin) { (s, _) =>
      Multimodal.audioFingerprint(Multimodal.wavFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)))
        .select(col("media_id"), col("channel"),
          shiftrightunsigned(col("fp"), 32).as("fp_hi"),
          col("fp").bitwiseAND(lit(0xffffffffL)).as("fp_lo"))
        .orderBy("media_id", "channel")
    },

    // audio near-dup pairs on the channel-0 fingerprint via the SAME
    // shared Hamming banding as mm_image_dedup (pigeonhole-complete at
    // <= 3, so the oracle's all-pairs join is the exact answer)
    df("mm_audio_dedup",
      """WITH m AS (SELECT doc_id AS media_id, 50 + doc_id % 101 AS frames
        |  FROM documents ORDER BY media_id LIMIT 100),
        |b AS (SELECT media_id, i,
        |    CASE WHEN (media_id * 7 + (i + 1) * 31) % 2001
        |            > (media_id * 7 + i * 31) % 2001
        |      THEN 1 ELSE 0 END AS bit
        |  FROM m CROSS JOIN generate_series(0, 63) t(i)
        |  WHERE i < frames - 1),
        |h AS (SELECT media_id,
        |  CAST(sum(CASE WHEN i >= 32
        |    THEN bit * (1::BIGINT << (i - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |  CAST(sum(CASE WHEN i < 32
        |    THEN bit * (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS lo
        |  FROM b GROUP BY media_id)
        |SELECT a.media_id AS id_a, b.media_id AS id_b,
        |  CAST(bit_count(xor(a.hi, b.hi))
        |     + bit_count(xor(a.lo, b.lo)) AS BIGINT) AS hamming
        |FROM h a JOIN h b ON a.media_id < b.media_id
        |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 3
        |ORDER BY id_a, id_b""".stripMargin) { (s, _) =>
      Multimodal.audioNearDup(Multimodal.wavFromDocuments(
          s.table("documents").orderBy("doc_id").limit(100)), maxHamming = 3)
        .orderBy("id_a", "id_b")
    },

    // image near-dup CLUSTERS: connected components over the dHash
    // banded pairs (the dedup family's cluster machinery applied to the
    // multimodal hashes — singleton images are not rows by contract);
    // the oracle states the transitive-closure truth recursively
    df("mm_image_clusters",
      s"""WITH RECURSIVE $duckDHashChain,
        |p AS (SELECT a.media_id AS ia, b.media_id AS ib
        |  FROM h a JOIN h b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.hi, b.hi))
        |      + bit_count(xor(a.lo, b.lo)) <= 3),
        |edges AS (SELECT ia AS s, ib AS d FROM p
        |  UNION SELECT ib, ia FROM p),
        |reach(a, b) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.a, e.d FROM reach r JOIN edges e ON e.s = r.b)
        |SELECT a AS id, least(a, min(b)) AS cluster_id
        |FROM reach GROUP BY a ORDER BY id""".stripMargin) { (s, _) =>
      import graft.operators.Dedup
      val pairs = Multimodal.imageNearDup(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)), maxHamming = 3)
        .select(col("id_a"), col("id_b"))
      Dedup.neardupClusters(pairs).orderBy("id")
    },

    // cluster -> keeper, completing the image family's dedup pipeline
    // end-to-end like the text family's (dd_cluster_keep_best): the
    // representative is the LARGEST image per near-dup cluster by REAL
    // decoded area (width x height from javax.imageio), min-id tiebreak;
    // the oracle replays the closure and the formula dims
    df("mm_image_keep_best",
      s"""WITH RECURSIVE $duckDHashChain,
        |p AS (SELECT a.media_id AS ia, b.media_id AS ib
        |  FROM h a JOIN h b ON a.media_id < b.media_id
        |  WHERE bit_count(xor(a.hi, b.hi))
        |      + bit_count(xor(a.lo, b.lo)) <= 3),
        |edges AS (SELECT ia AS s, ib AS d FROM p
        |  UNION SELECT ib, ia FROM p),
        |reach(a, b) AS (
        |  SELECT s, d FROM edges
        |  UNION
        |  SELECT r.a, e.d FROM reach r JOIN edges e ON e.s = r.b),
        |cl AS (SELECT a AS id, least(a, min(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |ar AS (SELECT media_id, CAST(w0 * h0 AS BIGINT) AS score FROM m),
        |mem AS (SELECT cl.id, cl.cluster_id, ar.score
        |  FROM cl JOIN ar ON ar.media_id = cl.id),
        |bs AS (SELECT cluster_id, max(score) AS best_score,
        |  CAST(count(*) AS BIGINT) AS cluster_size FROM mem GROUP BY cluster_id)
        |SELECT m2.cluster_id, CAST(min(m2.id) AS BIGINT) AS keeper_id,
        |  max(m2.score) AS best_score, max(b.cluster_size) AS cluster_size
        |FROM mem m2 JOIN bs b USING (cluster_id)
        |WHERE m2.score = b.best_score
        |GROUP BY m2.cluster_id ORDER BY cluster_id""".stripMargin) { (s, _) =>
      import graft.operators.{Dedup, Similarity}
      // ONE decode pass feeds both the pairing hash and the area score
      // (checkpointed — two consumer branches would re-decode otherwise)
      val profile = Multimodal.imageProfile(Multimodal.pngFromDocuments(
          s.table("documents").orderBy("doc_id").limit(150)))
        .localCheckpoint()
      val pairs = Similarity.hamming64NearDup(profile, maxHamming = 3,
          idCol = "media_id", hashCol = "dhash")
        .select(col("id_a"), col("id_b"))
      Dedup.clusterKeepBest(profile.select(col("media_id"), col("area")),
          Dedup.neardupClusters(pairs), col("area"), idCol = "media_id")
        .orderBy("cluster_id")
    },

    df("mm_frame_sample",
      """WITH hx AS (SELECT doc_id AS media_id, concat(md5(text), md5(concat('2:', text))) AS h
        |  FROM documents WHERE doc_id % 3 = 2)
        |SELECT media_id, f AS frame_idx, substring(h, f * 8 + 1, 16) AS frame_hex
        |FROM hx CROSS JOIN generate_series(0, 3) t(f)
        |ORDER BY media_id, frame_idx LIMIT 200""".stripMargin) { (s, _) =>
      Multimodal.frameSampleStub(Multimodal.asItems(
          Multimodal.fromDocuments(s.table("documents"))), n = 4)
        .toDF()
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          lower(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy("media_id", "frame_idx").limit(200)
    }
  )
}
