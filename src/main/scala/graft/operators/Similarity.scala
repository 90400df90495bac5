package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * Determinism contract: every float is cast to DOUBLE before arithmetic and
  * sums run left-to-right over the array (Spark `aggregate`), matching what a
  * sequential engine computes bit-for-bit; reported similarities are rounded
  * BEFORE ordering so ties sort identically in any engine.
  *
  * Scale notes (100 TB): brute force is an embarrassingly-parallel scan —
  * the query vector broadcasts, each partition computes local top-k, and only
  * k rows per partition reach the driver-side TakeOrderedAndProject. The LSH
  * path prunes that scan to matching hash buckets: the bucket id is a
  * partition-friendly key, so the corpus can be written bucketBy(bucket) and a
  * probe touches only its buckets' files (partition pruning at the source).
  */
object Similarity {

  /** embedding cast to DOUBLE elements (fp determinism + no float drift). */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Left-to-right dot product of two equally-sized double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine similarity against the single query row
    * `idCol == queryId`. The query side is one row — Spark broadcasts it, so
    * this is a map-only scan + global top-k (no shuffle of the corpus). */
  def cosineTopK(emb: DataFrame, queryId: Long, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(
      emb.where(col(idCol) === queryId)
        .select(asDouble(col(vecCol)).as("qv")))
    emb.where(col(idCol) =!= queryId)
      .crossJoin(q)
      .select(col(idCol), round(cosine(asDouble(col(vecCol)), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * first hex nibble of md5("p_d") mapped to [-7.5, 7.5]. The md5 is
    * evaluated at plan-build time (same digest any engine computes), so the
    * plane matrix lands in the plan as a compact array literal instead of
    * planes*dims codegen'd md5 calls — identical values, ~20x smaller plan. */
  def planeComponent(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"${p}_$d".getBytes("UTF-8"))
    ((h(0) >> 4) & 0xf) - 7.5 // first hex nibble - 8.5 == nibble value - 7.5
  }

  /** Sign-random-projection LSH: `planes` hyperplanes; bucket = the string of
    * sign bits of the dot products. Map-only (no shuffle); dot products sum
    * left-to-right over dims, matching a sequential engine bit-for-bit. */
  def lshBuckets(emb: DataFrame, planes: Int, dims: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val planesLit = array((0 until planes).map(p =>
      array((0 until dims).map(d => lit(planeComponent(p, d))): _*)): _*)
    val bucket = array_join(
      transform(planesLit, p =>
        when(dot(v, p) > 0, lit("1")).otherwise(lit("0"))), "")
    emb.select(col(idCol), col(vecCol), bucket.as("bucket"))
  }

  /** ANN top-k: exact cosine ranking restricted to the query's LSH bucket
    * (single-probe). Recall < 1 by construction; the bucketed scan touches
    * ~corpus/2^planes rows. */
  def annTopKLsh(emb: DataFrame, queryId: Long, k: Int, planes: Int, dims: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bucketed = lshBuckets(emb, planes, dims, idCol, vecCol)
    val q = broadcast(
      bucketed.where(col(idCol) === queryId)
        .select(asDouble(col(vecCol)).as("qv"), col("bucket").as("qbucket")))
    bucketed.where(col(idCol) =!= queryId)
      .join(q, col("bucket") === col("qbucket"))
      .select(col(idCol), round(cosine(asDouble(col(vecCol)), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** IVF coarse quantizer with deterministic md5-derived random centroids
    * (seed offset 1000 keeps them independent of the LSH planes): cell =
    * argmax over centroids of cos-score dot(v,c)/|c|. Random centroids give
    * a valid Voronoi partition without a training pass, so the assignment
    * is a pure map — and fully reproducible in any engine. */
  def ivfCentroid(p: Int, d: Int): Double = planeComponent(p + 1000, d)

  /** vec_id, embedding, per-centroid score array, assigned cell (0-based;
    * first-max wins on ties). Map-only. */
  def ivfCells(emb: DataFrame, centroids: Int, dims: Int,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val cents = array((0 until centroids).map(p =>
      array((0 until dims).map(d => lit(ivfCentroid(p, d))): _*)): _*)
    val norms = array((0 until centroids).map { p =>
      val n = math.sqrt((0 until dims).map(d => ivfCentroid(p, d))
        .foldLeft(0.0)((acc, x) => acc + x * x))
      lit(n)
    }: _*)
    val scores = transform(sequence(lit(0), lit(centroids - 1)), p =>
      dot(v, element_at(cents, p + 1)) / element_at(norms, p + 1))
    emb.select(col(idCol), col(vecCol), scores.as("cell_scores"))
      .withColumn("cell",
        (array_position(col("cell_scores"), array_max(col("cell_scores"))) - 1)
          .cast("int"))
  }

  /** IVF ANN top-k: probe the query's `nprobe` best cells (every cell whose
    * query score reaches the nprobe-th largest — ties widen the probe set
    * identically in any engine), exact cosine within probed cells. The cell
    * id is a partition/bucket-friendly key: written bucketBy(cell), a probe
    * touches only its cells' files. */
  def annTopKIvf(emb: DataFrame, queryId: Long, k: Int, centroids: Int,
                 nprobe: Int, dims: Int, idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val cells = ivfCells(emb, centroids, dims, idCol, vecCol)
    val q = broadcast(
      cells.where(col(idCol) === queryId)
        .select(asDouble(col(vecCol)).as("qv"),
          col("cell_scores").as("qscores"))
        .withColumn("thr", expr(s"sort_array(qscores, false)[${nprobe - 1}]")))
    cells.where(col(idCol) =!= queryId)
      .crossJoin(q)
      .where(expr("element_at(qscores, cell + 1) >= thr"))
      .select(col(idCol), round(cosine(asDouble(col(vecCol)), col("qv")), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Near-duplicate detection by embedding cosine over an explicit pair list
    * (id_a, id_b): returns pairs with similarity >= threshold. */
  def embeddingNearDups(emb: DataFrame, pairs: DataFrame, threshold: Double,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol), asDouble(col(vecCol)).as("v"))
    pairs
      .join(e.as("ea"), col("id_a") === col(s"ea.$idCol"))
      .join(e.as("eb"), col("id_b") === col(s"eb.$idCol"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("ea.v"), col("eb.v")), 4).as("sim"))
      .where(col("sim") >= threshold)
  }
}
