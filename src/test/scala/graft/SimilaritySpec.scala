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

  test("lsh bucket ids are valid bit strings partitioning the corpus") {
    val rows = Similarity.lshBuckets(emb, planes = 8, dims = 64)
      .groupBy("bucket").agg(count(lit(1)).as("cnt")).collect()
    assert(rows.forall(_.getString(0).matches("[01]{8}")))
    assert(rows.map(_.getLong(1)).sum == emb.count())
  }
}
