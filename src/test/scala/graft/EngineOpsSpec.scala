package graft

import org.apache.spark.sql.functions._

/** Engine-operation coverage for SURVEY.md §2.4 rows that are engine tests
  * rather than oracle queries: Q32 struct values, Q34 DESCRIBE/schema
  * introspection, Q35 CTAS, Q36 INSERT...SELECT, Q37 ALTER TABLE ADD
  * COLUMNS, Q38 COPY TO parquet/csv, Q39 recursive read + mergeSchema. */
class EngineOpsSpec extends SparkTestBase {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("engineops").toString

  test("Q32: struct construction and field access") {
    Tables.register(spark, sfDir)
    val df = spark.sql(
      """SELECT s.a + 1 AS b FROM
        |(SELECT named_struct('a', n_nationkey, 'name', n_name) AS s FROM nation) t
        |WHERE s.name = 'NATION_7'""".stripMargin)
    assert(df.count() == 1)
  }

  test("Q34: reader schemas match the declared engine schemas") {
    val fx = "src/test/resources/otlp"
    assert(Otlp.readLogs(spark, s"$fx/logs_simple.jsonl").schema
      == graft.otlp.OtlpSchemas.logs())
    assert(Otlp.readTraces(spark, s"$fx/traces_simple.jsonl").schema
      == graft.otlp.OtlpSchemas.traces())
    val described = spark.sql("DESCRIBE SELECT * FROM range(3)").collect()
    assert(described.nonEmpty)
  }

  test("Q35/Q36: CTAS round-trip + INSERT...SELECT append") {
    Tables.register(spark, sfDir)
    spark.sql("DROP TABLE IF EXISTS engineops_nation")
    spark.sql("CREATE TABLE engineops_nation AS SELECT * FROM nation")
    assert(spark.table("engineops_nation").count() == 25)
    spark.sql("INSERT INTO engineops_nation SELECT * FROM nation WHERE n_regionkey = 0")
    assert(spark.table("engineops_nation").count() == 30)
    spark.sql("DROP TABLE engineops_nation")
  }

  test("Q37: ALTER TABLE ADD COLUMNS widens an existing table") {
    spark.sql("DROP TABLE IF EXISTS engineops_alter")
    spark.sql("CREATE TABLE engineops_alter (id BIGINT) USING parquet")
    spark.sql("INSERT INTO engineops_alter VALUES (1)")
    spark.sql("ALTER TABLE engineops_alter ADD COLUMNS (extra STRING)")
    assert(spark.table("engineops_alter").columns.toSeq == Seq("id", "extra"))
    spark.sql("INSERT INTO engineops_alter VALUES (2, 'x')")
    assert(spark.table("engineops_alter").where(col("extra").isNull).count() == 1)
    spark.sql("DROP TABLE engineops_alter")
  }

  test("Q38: COPY TO parquet and csv round-trips") {
    Tables.register(spark, sfDir)
    val d = tmp()
    spark.table("region").write.parquet(s"$d/region_pq")
    assert(spark.read.parquet(s"$d/region_pq").count() == 5)
    spark.table("region").select("r_regionkey", "r_name")
      .write.option("header", "true").csv(s"$d/region_csv")
    assert(spark.read.option("header", "true").csv(s"$d/region_csv").count() == 5)
  }

  test("Q39: recursive file lookup + union_by_name (mergeSchema)") {
    val d = tmp()
    spark.range(3).selectExpr("id", "id * 2 AS a")
      .write.parquet(s"$d/part1/nested")
    spark.range(2).selectExpr("id", "CAST(id AS STRING) AS b")
      .write.parquet(s"$d/part2/nested")
    val merged = spark.read.option("recursiveFileLookup", "true")
      .option("mergeSchema", "true").parquet(d)
    assert(merged.count() == 5)
    assert(merged.columns.toSet == Set("id", "a", "b"))
  }

  test("promotedView: one call covers promoted, mixed, and never-promoted " +
    "table shapes") {
    import spark.implicits._
    // mixed: one legacy row (blob only), one promoted row
    val mixed = Seq(
      (null.asInstanceOf[String], """{"service.name":"legacy-svc"}"""),
      ("new-svc", """{"service.name":"stale-blob"}"""))
      .toDF("resource_attr_service_name", "resource_attributes")
    assert(Otlp.promotedView(mixed, Seq("service.name"))
      .select("resource_attr_service_name")
      .collect().map(_.getString(0)).toSeq == Seq("legacy-svc", "new-svc"))
    // never-promoted: the physical column does not exist — the view
    // still exposes it, reading from the blob
    val legacyOnly = Seq(
      Tuple1("""{"service.name":"old-svc","host.name":"h1"}"""))
      .toDF("resource_attributes")
    val v = Otlp.promotedView(legacyOnly, Seq("service.name", "host.name"))
    assert(v.select("resource_attr_service_name", "resource_attr_host_name")
      .first().toSeq == Seq("old-svc", "h1"))
  }

  test("batch convert pattern: read_otlp -> write parquet -> re-read") {
    val fx = "src/test/resources/otlp"
    val d = tmp()
    Otlp.readTraces(spark, s"$fx/traces_simple.jsonl")
      .write.parquet(s"$d/traces")
    val back = spark.read.parquet(s"$d/traces")
    assert(back.count() == 3)
    assert(back.where(col("name").like("%users%")).count() == 2)
  }
}
