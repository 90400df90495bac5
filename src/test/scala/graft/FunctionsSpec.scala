package graft

import graft.functions.WinnowingFingerprints
import org.apache.spark.sql.functions._

/** The native winnowing expression must be value-identical to the SQL
  * array formulation it replaced (which the DuckDB oracle mirrors):
  * k-gram md5-prefix hashes, w-window minima, distinct + sorted. */
class FunctionsSpec extends SparkTestBase {

  private val k = 8
  private val w = 4

  private def sqlFormulation(df: org.apache.spark.sql.DataFrame) =
    df.where(length(col("text")) >= k)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("hs", expr(
        s"transform(sequence(1, length(t) - ${k - 1}), p -> substring(md5(substr(t, p, $k)), 1, 8))"))
      .withColumn("fp", expr(
        s"""CASE WHEN size(hs) >= $w
           |THEN sort_array(array_distinct(transform(sequence($w, size(hs)),
           |  i -> array_min(slice(hs, i - ${w - 1}, $w)))))
           |ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin))
      .select(col("doc_id"), col("fp"))

  private def nativeFormulation(df: org.apache.spark.sql.DataFrame) = {
    WinnowingFingerprints.register(spark)
    df.where(length(col("text")) >= k)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .withColumn("fp", expr(s"winnowing_fingerprints(t, $k, $w)"))
      .select(col("doc_id"), col("fp"))
  }

  test("winnowing expression ≡ SQL formulation on the documents corpus") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val a = sqlFormulation(docs)
    val b = nativeFormulation(docs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(b.count() > 0)
  }

  test("winnowing expression ≡ SQL formulation on unicode + edge inputs") {
    import spark.implicits._
    val rows = Seq(
      1L -> "héllo wörld ünïcode ça va très bien",
      2L -> "日本語のテキストです。これはテストです。",
      3L -> "exactly8!",      // barely above k: 1-2 hashes, under w → empty set
      4L -> "aaaaaaaaaaaaaaaa", // degenerate repeats: one distinct hash
      5L -> "MiXeD CaSe TeXt WITH lower() FOLDING behaviour 12345")
      .toDF("doc_id", "text")
    val a = sqlFormulation(rows).collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = nativeFormulation(rows).collect().map(r =>
      r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a == b, s"sql=$a native=$b")
    assert(b(4L).size == 1)
    assert(b(3L).isEmpty)
  }

  test("minhash expression ≡ explode + min-aggregate formulation") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    // the relational formulation the native expression replaced (and the
    // DuckDB oracle still runs): one md5 per shingle, k doubled-digest
    // fragment minima behind a doc_id aggregate
    val sh = graft.operators.Dedup.shingles(docs, 3)
      .withColumn("h", md5(col("shingle")))
      .withColumn("h2", concat(col("h"), col("h")))
    val aggs = (0 until 8).map(i =>
      min(substring(col("h2"), 4 * i + 1, 16)).as(s"mh$i"))
    val relational = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val native = graft.operators.Dedup.minhashSignatures(docs)
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
    // and the native path is map-only — the shingle shuffle is gone
    assert(!native.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("minhash expression handles unicode and short docs like the SQL") {
    import spark.implicits._
    val docs = Seq(
      1L -> "héllo wörld ünïcode tokens here",
      2L -> "a b",          // fewer than n words -> filtered out
      3L -> "x y z")        // exactly one shingle
      .toDF("doc_id", "text")
    val got = graft.operators.Dedup.minhashSignatures(docs).collect()
    assert(got.map(_.getLong(0)).toSet == Set(1L, 3L))
    val one = got.find(_.getLong(0) == 3L).get
    // one shingle: every fragment is a substring of md5("x y z") doubled
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("x y z".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val h2 = h + h
    (0 until 8).foreach(i => assert(one.getString(i + 1) == h2.substring(4 * i, 4 * i + 16)))
  }

  test("simhash expression ≡ explode + vote-aggregate formulation") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val toks = docs.select(col("doc_id"),
        explode(graft.operators.Dedup.tokens(col("text"))).as("t"))
      .where(length(col("t")) > 0)
      .withColumn("v", expr("CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT)"))
    val votes = (0 until 32).map(j =>
      sum(expr(s"shiftright(v, ${31 - j}) & 1") * 2 - 1).as(s"vote$j"))
    val fingerprint = (0 until 32).map(j =>
      expr(s"CASE WHEN vote$j > 0 THEN shiftleft(CAST(1 AS BIGINT), $j) ELSE CAST(0 AS BIGINT) END"))
      .reduce(_ + _)
    val relational = toks.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
    val native = graft.operators.Dedup.simhash(docs)
    assert(native.exceptAll(relational).isEmpty &&
      relational.exceptAll(native).isEmpty)
    assert(!native.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("winnowing expression stays inside whole-stage codegen") {
    Tables.register(spark, sfDir)
    val plan = nativeFormulation(spark.table("documents"))
      .queryExecution.executedPlan.toString
    // codegen'd stages are starred; the project hosting the expression
    // must not fall back to interpreted eval
    assert(plan.contains("*("), plan)
  }

  test("array_sqdist ≡ the zip_with/aggregate lambda squared-L2, bit-for-bit") {
    Tables.register(spark, sfDir)
    graft.functions.ArraySqDist.register(spark)
    import org.apache.spark.sql.functions._
    val e = spark.table("embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") + 1 === col("b.vec_id"))
    val diff = pairs.select(
      expr("array_sqdist(a.v, b.v)").as("nat"),
      aggregate(zip_with(col("a.v"), col("b.v"), (x, c) => (x - c) * (x - c)),
        lit(0.0), (acc, x) => acc + x).as("lam"))
      .where(col("nat") =!= col("lam"))
    assert(diff.isEmpty, "identical summation order must give identical doubles")
  }

  test("array_dot ≡ the zip_with/aggregate lambda dot, bit-for-bit") {
    Tables.register(spark, sfDir)
    graft.functions.ArrayDot.register(spark)
    import org.apache.spark.sql.functions._
    val e = spark.table("embeddings")
      .select(col("vec_id"), transform(col("embedding"),
        x => x.cast("double")).as("v"))
    // self-pairs and shifted pairs exercise unequal vectors
    val pairs = e.as("a").join(e.as("b"),
      col("a.vec_id") === col("b.vec_id") ||
        col("a.vec_id") + 1 === col("b.vec_id"))
    val diff = pairs.select(
      expr("array_dot(a.v, b.v)").as("nat"),
      aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("lam"))
      .where(col("nat") =!= col("lam")) // exact, not approximate
    assert(diff.isEmpty, "identical summation order must give identical doubles")
    // and it must stay inside whole-stage codegen
    val plan = e.select(expr("array_dot(v, v)"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*("), plan)
  }
}
