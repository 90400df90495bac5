package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Property tests for the ANN path beyond the oracle value checks. */
class SimilaritySpec extends SparkTestBase {

  private lazy val emb = {
    Tables.register(spark, sfDir)
    spark.table("embeddings")
  }

  test("ann candidates all share the query's bucket and rank by exact cosine") {
    val buckets = Similarity.lshBuckets(emb, planes = 8, dims = 64)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val qBucket = buckets(7L)
    val ann = Similarity.annTopKLsh(emb, queryId = 7, k = 10,
      planes = 8, dims = 64).collect()
    assert(ann.forall(r => buckets(r.getLong(0)) == qBucket))
    val sims = ann.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse, "ann results must be sorted by sim desc")
  }

  test("ann similarities agree with the brute-force scores for the same ids") {
    val brute = Similarity.cosineTopK(emb, queryId = 7, k = emb.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ann = Similarity.annTopKLsh(emb, queryId = 7, k = 10,
      planes = 8, dims = 64).collect()
    assert(ann.nonEmpty)
    ann.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1),
      s"vec ${r.getLong(0)}: ann=${r.getDouble(1)} brute=${brute(r.getLong(0))}"))
  }

  test("ivf cells partition the corpus; ann probes only top cells") {
    val cells = Similarity.ivfCells(emb, centroids = 8, dims = 64)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells.values.toSet.subsetOf((0 until 8).toSet))
    assert(cells.size == emb.count())
    val ann = Similarity.annTopKIvf(emb, queryId = 7, k = 10,
      centroids = 8, nprobe = 2, dims = 64).collect()
    assert(ann.length == 10)
    // every candidate's cell is one of the query's 2 best cells (ties widen)
    val brute = Similarity.cosineTopK(emb, queryId = 7, k = emb.count().toInt)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach(r => assert(brute(r.getLong(0)) == r.getDouble(1)))
    val sims = ann.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("lsh bucket ids are valid bit strings partitioning the corpus") {
    val rows = Similarity.lshBuckets(emb, planes = 8, dims = 64)
      .groupBy("bucket").agg(count(lit(1)).as("cnt")).collect()
    assert(rows.forall(_.getString(0).matches("[01]{8}")))
    assert(rows.map(_.getLong(1)).sum == emb.count())
  }
}
