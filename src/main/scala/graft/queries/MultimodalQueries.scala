package graft.queries

import graft.QSpec
import graft.QSpec._
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline as oracle-checked queries. The binary content
  * is a deterministic md5-derived fake (no codecs in this environment), so
  * even the stubbed decode/feature/frame operators are value-checkable in
  * DuckDB by recomputing the same arithmetic on the hex text. */
object MultimodalQueries {

  /** DuckDB: value of hex digit k (1-based) of string h. */
  private def hv(k: String) = s"(strpos('0123456789abcdef', substring(h, $k, 1)) - 1)"
  /** DuckDB: unsigned byte i (0-based) of hex string h. */
  private def byteAt(i: String) = s"(${hv(s"($i)*2+1")} * 16 + ${hv(s"($i)*2+2")})"

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

    df("mm_decode_stub",
      s"""WITH m AS (SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  md5(text) AS h FROM documents)
         |SELECT media_id, media_type,
         |  ${byteAt("0")} * 256 + ${byteAt("1")} AS width,
         |  ${byteAt("2")} * 256 + ${byteAt("3")} AS height,
         |  1 + (${byteAt("4")} % 4) AS channels,
         |  CAST(32 AS BIGINT) AS n_bytes
         |FROM m ORDER BY media_id LIMIT 100""".stripMargin) { (s, _) =>
      Multimodal.decodeStub(Multimodal.asItems(
          Multimodal.fromDocuments(s.table("documents"))))
        .toDF().orderBy("media_id").limit(100)
    },

    // resize then decode: the stub rewrites the fake dimension header, so
    // decode reports exactly the target dims with channels/length intact
    df("mm_resize_stub",
      s"""WITH m AS (SELECT doc_id AS media_id,
         |  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
         |  md5(text) AS h FROM documents)
         |SELECT media_id, media_type,
         |  64 AS width, 48 AS height,
         |  1 + (${byteAt("4")} % 4) AS channels,
         |  CAST(32 AS BIGINT) AS n_bytes
         |FROM m ORDER BY media_id LIMIT 100""".stripMargin) { (s, _) =>
      Multimodal.decodeStub(Multimodal.resizeStub(Multimodal.asItems(
          Multimodal.fromDocuments(s.table("documents"))), w = 64, h = 48))
        .toDF().orderBy("media_id").limit(100)
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
        .orderBy("media_id", "dim")
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
        .select(col("media_id"), col("frame_idx"),
          lower(hex(col("frame_bytes"))).as("frame_hex"))
        .orderBy("media_id", "frame_idx").limit(200)
    }
  )
}
