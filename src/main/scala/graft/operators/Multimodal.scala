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
  * STUB NOTICE: this container has no image/audio codecs, so `decodeStub`,
  * `featureStub` and `frameSampleStub` compute deterministic fakes from the
  * bytes (documented below). The Spark-side plumbing — schema, encoders,
  * partition-preserving iterators, batch shape — is real and is what the
  * tests cover; swapping a fake for javax.imageio/ffmpeg changes only the
  * function body marked STUB.
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

  /** STUB decode: reads a fake header from the first bytes instead of a real
    * codec. width = b0*256+b1, height = b2*256+b3, channels = 1 + (b4 % 4).
    * Deterministic in the bytes; real decode would replace the body only. */
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

  /** STUB resize: rewrites the fake 4-byte dimension header to the target
    * (width, height) and keeps the remaining bytes — so the contract
    * `decodeStub(resizeStub(m, w, h))` reports exactly (w, h) with
    * channels/type/length preserved, which is what the spec pins. A real
    * implementation replaces the body with an image-library scale (and
    * shrinks the payload); the map-only per-partition shape and the
    * decode-after-resize contract are the real parts. */
  def resizeStub(media: Dataset[MediaItem], w: Int, h: Int): Dataset[MediaItem] = {
    import media.sparkSession.implicits._
    require(w > 0 && w < 65536 && h > 0 && h < 65536, "dims must fit u16")
    media.mapPartitions { it =>
      it.map { m =>
        val out = m.content.clone()
        if (out.length >= 4) {
          out(0) = (w / 256).toByte; out(1) = (w % 256).toByte
          out(2) = (h / 256).toByte; out(3) = (h % 256).toByte
        }
        MediaItem(m.media_id, m.media_type, out)
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
