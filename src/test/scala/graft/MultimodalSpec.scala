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

  test("resizeStub: decode-after-resize reports the target dims with " +
    "type, channels, and byte length preserved; map-only") {
    val items = Multimodal.asItems(media)
    val before = Multimodal.decodeStub(items).collect()
      .map(m => m.media_id -> m).toMap
    val resized = Multimodal.resizeStub(items, w = 320, h = 200)
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
    val after = Multimodal.decodeStub(resized).collect()
    assert(after.nonEmpty)
    after.foreach { m =>
      assert(m.width == 320 && m.height == 200, s"dims ${m.width}x${m.height}")
      val b = before(m.media_id)
      assert(m.media_type == b.media_type && m.channels == b.channels &&
        m.n_bytes == b.n_bytes, "resize must only change the dimensions")
    }
  }

  test("frameSampleStub yields n frames per video only") {
    val frames = Multimodal.frameSampleStub(Multimodal.asItems(media), n = 4)
    val videos = media.where(col("media_type") === "video").count()
    assert(frames.count() == videos * 4)
  }
}
