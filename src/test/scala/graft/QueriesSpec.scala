package graft

/** Every registered query runs, is deterministic across two runs, and its
  * oracle SQL references only driver-visible tables. The value-level oracle
  * comparison itself runs out-of-band (tools/compare.py vs DuckDB).
  */
class QueriesSpec extends SparkTestBase {

  test("query names are unique and well-formed") {
    val names = SparkEntry.specs.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), n))
  }

  test("oracleSql keys are a subset of queries keys") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
  }

  test("bench/verify name filter anchors on prefixes, not substrings") {
    // the footgun this pins down: a substring filter of "ss_" used to
    // select dd_cro·ss_·dedup and mi·ss_·anything along with the ss_ family
    assert(QSpec.nameMatches(None, "anything"))
    assert(QSpec.nameMatches(Some("ss_"), "ss_ann_pq"))
    assert(!QSpec.nameMatches(Some("ss_"), "dd_cross_dedup"))
    assert(QSpec.nameMatches(Some("ta_vocab"), "ta_vocab")) // exact name
    assert(!QSpec.nameMatches(Some("ta_vocab"), "ta_voc"))  // prefix of filter != match
    assert(QSpec.nameMatches(Some("dd_,ss_ann"), "ss_ann_ivf")) // comma list
    assert(QSpec.nameMatches(Some("dd_, ss_ann"), "dd_semdedup"))
    assert(!QSpec.nameMatches(Some("dd_,ss_ann"), "ss_cosine_topk"))
    // a blank filter has no usable tokens — treated as unfiltered
    assert(QSpec.nameMatches(Some(""), "anything"))
    assert(QSpec.nameMatches(Some(" , "), "anything"))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q08 approx variants land within sketch tolerance of the exact values") {
    // the production scale path must be CLOSE, not just runnable: the
    // 10000-accuracy sketch is far tighter than 1% on this distribution
    def one(name: String): Double = SparkEntry.specs.find(_.name == name).get
      .spark(spark, sfDir).head().getDouble(0)
    val (exactP95, approxP95) = (one("q08_percentile"), one("q08_percentile_approx"))
    val (exactMed, approxMed) = (one("q08_median"), one("q08_median_approx"))
    assert(math.abs(approxP95 - exactP95) / exactP95 < 0.01, s"$approxP95 vs $exactP95")
    assert(math.abs(approxMed - exactMed) / exactMed < 0.01, s"$approxMed vs $exactMed")
  }

  for (q <- SparkEntry.specs) {
    test(s"${q.name} runs and is deterministic") {
      val r1 = q.spark(spark, sfDir).collect()
      val r2 = q.spark(spark, sfDir).collect()
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"${q.name} not deterministic across runs")
    }
  }
}
