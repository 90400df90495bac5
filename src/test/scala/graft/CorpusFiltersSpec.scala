package graft

import graft.operators.CorpusFilters
import org.apache.spark.sql.functions._

/** Behavior tests for the corpus-curation filters on inputs with real
  * structure (the synthetic documents table is single-line word salad, so
  * the oracle checks values but not the interesting branches). */
class CorpusFiltersSpec extends SparkTestBase {

  test("c4 filter: keeps punctuated prose lines, drops short/code/boilerplate") {
    import spark.implicits._
    val docs = Seq(
      // 3 good lines -> keep
      1L -> "This is a clean sentence.\nAnother proper line ends here!\nDoes this also survive the filter?",
      // terminal punctuation but < 3 words, and a javascript line -> drop
      2L -> "Too short.\nPlease enable javascript to continue reading this page.",
      // brace flag kills the document even with good lines
      3L -> "A perfectly good sentence lives here.\nfunction f() { return 1; }\nAnother good sentence ends properly.\nAnd a third one ends here too.",
      // lorem ipsum flag
      4L -> "Lorem ipsum dolor sit amet consectetur.\nA real sentence follows the boilerplate.\nAnd yet another real one ends here.")
      .toDF("doc_id", "text")
    val got = CorpusFilters.c4LineFilter(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("kept_lines"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == ((3L, true)))
    assert(got(2L) == ((0L, false)))
    assert(got(3L)._2 == false) // brace flag
    assert(got(3L)._1 == 3L)    // the code line itself was also dropped
    assert(got(4L)._2 == false) // lorem flag
  }

  test("repetition stats: finds the dominant word and 2-gram deterministically") {
    import spark.implicits._
    val docs = Seq(
      1L -> "spam spam spam spam eggs",
      // tie between 'a b' and 'b a' bigram counts -> lexicographically first
      2L -> "a b a b a")
      .toDF("doc_id", "text")
    val got = CorpusFilters.repetitionStats(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[String]("top_word") == "spam")
    assert(got(1L).getAs[Long]("top_word_cnt") == 4L)
    assert(got(1L).getAs[Double]("top_word_frac") == 0.8)
    assert(got(1L).getAs[String]("top_2gram") == "spam spam")
    assert(got(2L).getAs[String]("top_word") == "a")
    assert(got(2L).getAs[String]("top_2gram") == "a b")
  }

  test("chunk dedup: shared chunks keep only their first occurrence") {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val docs = Seq(
      1L -> (boiler + " " + (1 to 16).map(i => s"uniqA$i").mkString(" ")),
      2L -> (boiler + " " + (1 to 16).map(i => s"uniqB$i").mkString(" ")),
      3L -> boiler)
      .toDF("doc_id", "text")
    val got = CorpusFilters.chunkDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("kept_chunks")))).toMap
    assert(got(1L) == ((2L, 2L))) // first occurrence of the boilerplate
    assert(got(2L) == ((2L, 1L))) // boilerplate chunk deduplicated away
    assert(got(3L) == ((1L, 0L)))
  }

  test("cdc dedup: chunk alignment survives an insertion (fixed chunks don't)") {
    import spark.implicits._
    // doc 2 = doc 1 with ONE word prepended: every fixed 16-word chunk
    // misaligns, but content-defined boundaries re-sync at the first
    // boundary after the insertion, so most of doc 2's chunks dedup away
    val words = (0 until 240).map(i => s"w${i * 7 % 241}")
    val docs = Seq(
      1L -> words.mkString(" "),
      2L -> ("inserted " + words.mkString(" ")))
      .toDF("doc_id", "text")
    val cdc = CorpusFilters.cdcChunkDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dropped_chunks")).toMap
    val fixed = CorpusFilters.chunkDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dropped_chunks")).toMap
    assert(cdc(1L) == 0L)
    assert(cdc(2L) >= 1L, s"cdc should re-sync after the insertion: $cdc")
    assert(fixed(2L) == 0L, s"fixed chunks misalign entirely: $fixed")
  }

  test("cdc dedup: block-local prefix sum equals the single-window truth " +
      "and spreads a giant document over many blocks") {
    import spark.implicits._
    // a "giant" document relative to a tiny block size: with blockWords=8
    // the 500-word doc spans ~63 blocks, so the prefix-sum decomposition
    // (local window within (doc_id, block) + block-offset roll-up) is
    // genuinely exercised; blockWords >> doc length degenerates to the
    // original one-window-per-doc formulation
    val words = (0 until 500).map(i => s"g${i * 13 % 997}")
    val docs = Seq(
      1L -> words.mkString(" "),
      2L -> words.take(100).mkString(" "),
      3L -> ("x " + words.mkString(" ")))
      .toDF("doc_id", "text")
    def rows(blockWords: Int) =
      CorpusFilters.cdcChunkDedup(docs, blockWords = blockWords).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("kept_chunks"))).toSet
    assert(rows(8) == rows(1 << 20), "chunk numbering must not depend on block size")
    // the plan's heavy window partitions on (doc_id, blk), never doc_id
    // alone — asserted on the pre-checkpoint chunk frame (cdcChunkDedup
    // checkpoints it, which hides the upstream plan behind an RDD scan)
    val p = CorpusFilters.cdcChunks(docs, blockWords = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(doc_id"), p)
    assert(p.contains("blk"), p)
  }

  test("decontamination: docs sharing eval 5-grams are flagged, others not") {
    import spark.implicits._
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val evalDocs = Seq(100L -> evalText).toDF("doc_id", "text")
    val docs = Seq(
      // carries the eval run "beta gamma delta epsilon zeta" → contaminated
      1L -> "intro words then beta gamma delta epsilon zeta closing remark",
      2L -> "completely unrelated content with many distinct words here now",
      3L -> "short text")
      .toDF("doc_id", "text")
    val got = CorpusFilters.decontaminate(docs, evalDocs, n = 5).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("matched_grams"), r.getAs[Boolean]("contaminated")))).toMap
    assert(got(1L)._2 && got(1L)._1 >= 1L)
    assert(got(2L) == ((0L, false)))
    assert(got(3L) == ((0L, false))) // fewer than 5 words → zero grams
  }

  test("gopher filter: rule measurements and combined verdict") {
    import spark.implicits._
    val good = (("the quick brown fox jumps over lazy dogs and then " * 6) +
      "that have with be of to end").trim
    val docs = Seq(
      1L -> good,                       // >= 50 words, stopwords present
      2L -> "too short to keep",        // fails minWords
      3L -> (("#tag " * 60).trim))      // symbol ratio 1.0, no stopwords
      .toDF("doc_id", "text")
    val got = CorpusFilters.gopherFilter(docs, minWords = 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), got(1L).toString)
    assert(got(1L).getAs[Long]("stop_hits") >= 2L)
    assert(!got(2L).getAs[Boolean]("keep"))
    assert(!got(3L).getAs[Boolean]("keep"))
    assert(got(3L).getAs[Double]("symbol_ratio") == 1.0)
  }

  test("pii redaction: counts and replaces emails, ips, phones in order") {
    import spark.implicits._
    val docs = Seq(
      1L -> "mail a.user+tag@sub.example.org and b@x.io, host 192.168.1.1, call +4915112345678 now",
      2L -> "clean text with short digits 123 and a dotless 1234 inside")
      .toDF("doc_id", "text")
    val got = CorpusFilters.redactPii(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("n_emails") == 2L)
    assert(got(1L).getAs[Long]("n_ips") == 1L)
    // the IP was replaced before phone counting — its octets never count
    assert(got(1L).getAs[Long]("n_phones") == 1L)
    assert(got(2L).getAs[Long]("n_emails") == 0L)
    assert(got(2L).getAs[Long]("n_phones") == 0L)
    val red = docs.where($"doc_id" === 1L)
      .select(CorpusFilters.redactedText(col("text"))).first().getString(0)
    assert(red == "mail <EMAIL> and <EMAIL>, host <IP>, call <PHONE> now", red)
  }

  test("shard packing: deterministic, complete, and budget-bounded") {
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val a = CorpusFilters.packShards(docs, budgetTokens = 64)
    val b = CorpusFilters.packShards(docs.repartition(7), budgetTokens = 64)
    // reproducible under any input partitioning
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // every document assigned exactly once
    assert(a.count() == docs.count())
    // each shard's token load stays under budget + its final document
    // (a doc is placed by its PRECEDING cumulative count)
    val maxToks = docs.select(max(graft.operators.TextAnalysis
      .wsTokens(col("text")).cast("long"))).first().getLong(0)
    val over = a.groupBy("grp", "shard").agg(sum("toks").as("t"))
      .where(col("t") >= lit(64L) + maxToks).count()
    assert(over == 0L)
  }

  test("line dedup removes boilerplate from ALL docs (no keep-first), " +
    "trims before matching, and digests the survivors") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      1L -> "unique first line.\nSubscribe now!\ncontent of doc one",
      2L -> "Subscribe now!\ncontent of doc two",
      // trimmed match + empty lines ignored
      3L -> "  Subscribe now!  \n\nclosing line of doc three")
      .toDF("doc_id", "text")
    val got = CorpusFilters.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("removed_lines"),
          r.getAs[Long]("kept_lines"), r.getAs[String]("kept_digest")))).toMap
    // 'Subscribe now!' is in 3 distinct docs -> removed EVERYWHERE,
    // including its first occurrence
    assert(got(1L) == ((3L, 1L, 2L,
      md5hex("unique first line.\ncontent of doc one"))))
    assert(got(2L) == ((2L, 1L, 1L, md5hex("content of doc two"))))
    // the empty line never counts; the trimmed boilerplate still matches
    assert(got(3L) == ((2L, 1L, 1L, md5hex("closing line of doc three"))))
  }

  test("quality-above-median: kept iff quality clears the OWN stratum's " +
    "median; at least half of every stratum is kept") {
    Tables.register(spark, sfDir)
    val rows = graft.operators.TextAnalysis
      .qualityAboveMedian(spark.table("documents")).collect()
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val med = rs.head.getAs[Double]("stratum_median")
      assert(rs.forall(_.getAs[Double]("stratum_median") == med))
      rs.foreach { r =>
        assert(r.getAs[Boolean]("keep") ==
          (r.getAs[Double]("quality") >= med), s"$lang keep flag")
      }
      val kept = rs.count(_.getAs[Boolean]("keep"))
      assert(kept * 2 >= rs.length, s"$lang: median property keeps >= half")
    }
  }

  test("perplexity buckets: a tercile partition ordered head < middle < " +
    "tail by surprisal, thresholds shared by every row") {
    Tables.register(spark, sfDir)
    val rows = graft.operators.TextAnalysis
      .perplexityBuckets(spark.table("documents")).collect()
    assert(rows.length == spark.table("documents").count())
    val t1 = rows.head.getAs[Double]("t1")
    val t2 = rows.head.getAs[Double]("t2")
    assert(t1 <= t2)
    rows.foreach { r =>
      assert(r.getAs[Double]("t1") == t1 && r.getAs[Double]("t2") == t2)
      val s = r.getAs[Double]("surprisal")
      val want = if (s <= t1) "head" else if (s <= t2) "middle" else "tail"
      assert(r.getAs[String]("bucket") == want)
    }
    // terciles: no bucket takes more than half the corpus (exact thirds
    // only when no threshold ties), and all three are non-empty
    val sizes = rows.groupBy(_.getAs[String]("bucket")).view.mapValues(_.length)
    assert(Set("head", "middle", "tail").subsetOf(sizes.keys.toSet))
    sizes.values.foreach(n => assert(n * 2 <= rows.length + 1))
  }

  test("quality classifier: on a separable corpus GD separates — positive " +
    "mean score above negative, margin widening with iterations") {
    import spark.implicits._
    // two disjoint vocabularies -> disjoint hash slots -> linearly separable
    val docs = ((0 until 20).map { i =>
      (i.toLong, "good", "alpha beams align and alpha arrays bloom in alpha fields")
    } ++ (20 until 40).map { i =>
      (i.toLong, "junk", "zug vex quorp mizzle drang krell fosh wumble parn jex")
    }).toDF("doc_id", "source", "text")
    def meanGap(iters: Int): Double = {
      val m = graft.operators.TextAnalysis
        .qualityClassifier(docs, positive = col("source") === "good",
          iters = iters)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .groupBy(col("source") === "good").agg(avg("score"))
        .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      m(true) - m(false)
    }
    val gap1 = meanGap(1)
    val gap3 = meanGap(3)
    assert(gap1 > 0.0, s"one step must already lean positive: $gap1")
    assert(gap3 > gap1, s"training must widen the margin: $gap3 <= $gap1")
    // and every doc lands on its own side at 3 iters
    val scored = graft.operators.TextAnalysis
      .qualityClassifier(docs, col("source") === "good").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    (0 until 20).foreach(i => assert(scored(i.toLong), s"doc $i"))
    (20 until 40).foreach(i => assert(!scored(i.toLong), s"doc $i"))
    // deterministic on the real corpus: retraining reproduces every score
    Tables.register(spark, sfDir)
    val real = spark.table("documents")
    val s1 = graft.operators.TextAnalysis
      .qualityClassifier(real, col("source") === "src0").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val s2 = graft.operators.TextAnalysis
      .qualityClassifier(real, col("source") === "src0").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(s1 == s2)
  }

  test("quality calibration: bins partition the corpus, positives " +
    "concentrate in high-score bins on a separable corpus") {
    import spark.implicits._
    val docs = ((0 until 20).map { i =>
      (i.toLong, "good", "alpha beams align and alpha arrays bloom in alpha fields")
    } ++ (20 until 40).map { i =>
      (i.toLong, "junk", "zug vex quorp mizzle drang krell fosh wumble parn jex")
    }).toDF("doc_id", "source", "text")
    val cal = graft.operators.TextAnalysis
      .qualityCalibration(docs, positive = col("source") === "good")
      .collect().sortBy(_.getAs[Int]("bin"))
    // bins partition the corpus exactly
    assert(cal.map(_.getAs[Long]("n_docs")).sum == 40L, cal.mkString("; "))
    assert(cal.forall(r => r.getAs[Int]("bin") >= 0 &&
      r.getAs[Int]("bin") <= 9))
    // positives total the positive class and live strictly above the
    // negatives' bins on a separable corpus
    assert(cal.map(_.getAs[Long]("positives")).sum == 20L)
    val posBins = cal.filter(_.getAs[Long]("positives") > 0)
      .map(_.getAs[Int]("bin"))
    val negBins = cal.filter(r =>
      r.getAs[Long]("positives") < r.getAs[Long]("n_docs"))
      .map(_.getAs[Int]("bin"))
    assert(posBins.min > negBins.max,
      s"pos bins $posBins must sit above neg bins $negBins")
    // mean_score stays inside its bin's [bin/10, bin/10 + 0.1) band
    cal.foreach { r =>
      val b = r.getAs[Int]("bin"); val m = r.getAs[Double]("mean_score")
      assert(m >= b / 10.0 - 1e-9 && (b == 9 || m < (b + 1) / 10.0 + 1e-9),
        s"bin $b mean $m")
    }
  }

  test("novelty: exact duplicates score 0, unique docs 1, overlaps by hand") {
    import spark.implicits._
    val docs = Seq(
      (0L, "red fish blue fish"),       // dup of 1 -> novelty 0
      (1L, "red fish blue fish"),
      (2L, "green moss grows slowly"),  // fully unique -> novelty 1
      // bigrams: (red fish) shared with 0/1; (fish swims) (swims away) novel
      (3L, "red fish swims away")
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.noveltyScore(docs, n = 2).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_grams"), x.getAs[Long]("novel_grams"),
          x.getAs[Double]("novelty"))).toMap
    assert(r(0L) == ((3L, 0L, 0.0)), r)
    assert(r(1L) == ((3L, 0L, 0.0)), r)
    assert(r(2L) == ((3L, 3L, 1.0)), r)
    assert(r(3L) == ((3L, 2L, 0.6667)), r)
    // within-doc repetition of an otherwise-unique gram stays novel
    // (reach counts DISTINCT docs), and multiplicity counts in n_grams
    val rep = Seq((0L, "odd pair odd pair odd")).toDF("doc_id", "text")
    val rr = graft.operators.TextAnalysis.noveltyScore(rep, n = 2)
      .collect().head
    assert(rr.getAs[Long]("n_grams") == 4L &&
      rr.getAs[Double]("novelty") == 1.0, rr)
  }

  test("bpe merges: hand-computed greedy rounds on the classic corpus") {
    import spark.implicits._
    // words: low x3, lower x2, newest x4
    // r1 pair counts: we = 2(lower) + 4(newest) = 6 wins
    // r2: lo = 3(low) + 2(lower) = 5 wins
    // r3: four pairs tie at 4 -> lexicographically smallest (e, we)
    val docs = Seq(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest")
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeMerges(docs, merges = 3)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("cnt"))).toSeq
    assert(got == Seq((1, "w", "e", 6L), (2, "l", "o", 5L), (3, "e", "we", 4L)))
  }

  test("bpe merges: greedy left-to-right application (aaaa -> aa,aa)") {
    import spark.implicits._
    // r1 counts overlapping pairs like classic get_stats: (a,a) = 3 per
    // 'aaaa' x3 = 9. The APPLICATION is greedy non-overlapping, so round 2
    // must see 'aaaa' as [aa, aa] — pair (aa,aa) x3 — not [aa, a, a]
    val docs = Seq(1L -> "aaaa aaaa aaaa xy").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bpeMerges(docs, merges = 2)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[Long]("cnt"))).toSeq
    assert(got == Seq((1, "a", "a", 9L), (2, "aa", "aa", 3L)))
  }

  test("bpe encode: learned merges applied in order, tokens in doc order") {
    import spark.implicits._
    // merges on this corpus (hand-computed above): (w,e), (l,o), (e,we).
    // low -> [lo w]; lower -> [lo we r]; newest -> [n ewe s t]
    val docs = Seq(
      1L -> "low low low lower lower",
      2L -> "newest newest newest newest")
      .toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeMerges(docs, merges = 3)
    val got = graft.operators.TextAnalysis.bpeEncode(docs, merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[String]("tok_digest"))).toSeq
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val d1 = md5hex("lo w lo w lo w lo we r lo we r")
    val d2 = md5hex("n ewe s t n ewe s t n ewe s t n ewe s t")
    assert(got == Seq((1L, 12L, d1), (2L, 16L, d2)))

    // degenerate corpus: vocabulary exhausts before the requested rounds
    // (merges = 3 but only 2 are learnable) — bpeMerges stops early and
    // bpeEncode applies the short table; digests match the DuckDB
    // oracle's LEFT JOIN no-op rounds (ta_bpe_encode)
    val tiny = Seq(1L -> "aa aa aa", 2L -> "aa bb").toDF("doc_id", "text")
    val tinyGot = graft.operators.TextAnalysis.bpeEncode(tiny,
        graft.operators.TextAnalysis.bpeMerges(tiny, merges = 3))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bpe_tokens"),
        r.getAs[String]("tok_digest"))).toSeq
    assert(tinyGot == Seq((1L, 3L, md5hex("aa aa aa")), (2L, 2L, md5hex("aa bb"))))
  }

  test("cross-corpus chunk dedup: ref-seen chunks dropped, batch-internal " +
    "duplicates untouched, fully_dup flags empty survivors") {
    import spark.implicits._
    val boiler = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val ref = Seq(10L -> boiler).toDF("doc_id", "text")
    val raw = Seq(
      1L -> (boiler + " " + (1 to 16).map(i => s"uniqA$i").mkString(" ")),
      2L -> boiler, // nothing left
      3L -> (1 to 16).map(i => s"uniqC$i").mkString(" "),
      // same unique chunk as doc 3: within-batch dup is NOT this op's job
      4L -> (1 to 16).map(i => s"uniqC$i").mkString(" "))
      .toDF("doc_id", "text")
    val got = CorpusFilters.crossChunkDedup(raw, ref).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("dropped_chunks"), r.getAs[Long]("kept_chunks"),
          r.getAs[Boolean]("fully_dup")))).toMap
    assert(got(1L) == ((1L, 1L, false)))
    assert(got(2L) == ((1L, 0L, true)))
    assert(got(3L) == ((0L, 1L, false)))
    assert(got(4L) == ((0L, 1L, false)), "batch-internal dup survives")
  }

  test("hash embedding: unit norm, content-determined, vocabulary overlap " +
    "orders cosine") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon", // identical text
      3L -> "alpha beta gamma delta zeta",    // 4/5 shared
      4L -> "omicron rho sigma tau phi")      // disjoint
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.hashEmbedding(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Double](r.fieldIndex("embedding"))).toMap
    assert(got(1L) == got(2L), "same text, same embedding")
    got.values.foreach { v =>
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 0.01, "unit norm")
    }
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(cos(got(1L), got(3L)) > cos(got(1L), got(4L)),
      "shared vocabulary must beat disjoint vocabulary")
  }

  test("composition: hashEmbedding feeds semDedup — duplicate raw-text " +
    "docs are caught without any model embeddings") {
    import spark.implicits._
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "the quick brown fox jumps over the lazy dog tonight", // dup
      3L -> "completely different vocabulary discussing spark catalyst internals")
      .toDF("doc_id", "text")
    val emb = graft.operators.TextAnalysis.hashEmbedding(docs)
      .withColumnRenamed("doc_id", "vec_id")
    val got = graft.operators.Similarity.semDedup(emb, centroids = 2,
        dims = 64, threshold = 0.99, sampleMod = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("dropped")).toMap
    assert(!got(1L) && got(2L), "identical text -> identical hash embedding -> dropped")
    assert(!got(3L), "distinct vocabulary survives")
  }

  test("bigram surprisal: hand-computed add-one values; frequent " +
    "transitions score below rare ones") {
    import spark.implicits._
    // corpus: unigrams a:3 b:2 x:1 y:1 -> V=4
    // doc 1 bigrams: (a,b)x2 (b,a)x2, cb(ab)=2 cb(ba)=2, cu(a)=3 cu(b)=2
    //   nll(ab) = -ln(3/7), nll(ba) = -ln(3/6); mean = 0.7702
    // doc 2: (x,y) once -> -ln(2/5) = 0.9163
    val docs = Seq(1L -> "a b a b a", 2L -> "x y").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.bigramSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("surprisal")))).toMap
    assert(got(1L) == ((4L, 0.7702)))
    assert(got(2L) == ((1L, 0.9163)))
    assert(got(1L)._2 < got(2L)._2)
  }

  test("vocab drift: identical distributions score 0, hand-computed JSD " +
    "for disjoint vocabularies") {
    import spark.implicits._
    // same: both strata are the distribution {x:2/3, y:1/3} -> JSD 0
    val same = Seq(("a", "x x y"), ("b", "x x y")).toDF("source", "text")
    val gotSame = graft.operators.TextAnalysis.vocabDrift(same).collect()
      .map(r => r.getAs[String]("stratum") ->
        r.getAs[Double]("js_divergence")).toMap
    assert(gotSame == Map("a" -> 0.0, "b" -> 0.0))
    // disjoint: A={a:1}, corpus Q={a:.5,b:.5}; present term a:
    // (1*ln(1/.75) + .5*ln(.5/.75))/2 = 0.042475; absent mass:
    // .5*ln2*(1-.5) = 0.173287 -> 0.2158 (symmetric for B)
    val disj = Seq(("a", "aa aa"), ("b", "bb bb")).toDF("source", "text")
    val gotDisj = graft.operators.TextAnalysis.vocabDrift(disj).collect()
      .map(r => r.getAs[String]("stratum") ->
        r.getAs[Double]("js_divergence")).toMap
    assert(gotDisj == Map("a" -> 0.2158, "b" -> 0.2158))
  }

  test("zipfFit: exact least-squares fit on a constructed distribution; " +
    "a perfect zipf corpus reports slope -1, r2 1") {
    import spark.implicits._
    // freq(a)=4 at rank 1, freq(b)=2 at rank 2: exactly freq = 4/rank,
    // so the log-log fit is slope -1, intercept ln 4, r2 = 1
    val docs = Seq((1L, "a a a a b b")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.zipfFit(docs).collect().head
    assert(r.getAs[Long]("n_terms") == 2L &&
      r.getAs[Long]("n_tokens") == 6L, r)
    assert(r.getAs[Double]("slope") == -1.0, r)
    assert(r.getAs[Double]("intercept") ==
      BigDecimal(math.log(4)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble, r)
    assert(r.getAs[Double]("r2") == 1.0, r)
  }

  test("intra-doc dedup: repeated lines collapse to first occurrence in " +
    "order, other docs never consulted") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha line\nbeta line\nalpha line\n  beta line  \ngamma line",
      2L -> "alpha line", // same line as doc 1 — must NOT be removed here
      3L -> "\n\n  \n")   // nothing but blanks
      .toDF("doc_id", "text")
    val got = CorpusFilters.intraDocDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("kept_lines"),
          r.getAs[String]("kept_digest")))).toMap
    // doc 1: 5 nonblank lines, trimmed dup of beta also collapses
    assert(got(1L)._1 == 5L && got(1L)._2 == 3L)
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha line\nbeta line\ngamma line".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got(1L)._3 == digest, "survivors keep document order")
    assert(got(2L) == ((1L, 1L, got(2L)._3)), "cross-doc repeats untouched")
    assert(got(3L)._1 == 0L && got(3L)._2 == 0L)
  }

  test("fuzzy decontamination: exact eval copy collides on all bands, " +
    "disjoint text on none") {
    import spark.implicits._
    val benchmark = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strange potions under a pale winter moon tonight"
    val evalDocs = Seq(100L -> benchmark).toDF("doc_id", "text")
    val corpus = Seq(
      1L -> benchmark, // verbatim leak: identical signature, all 4 bands hit
      2L -> ("completely different vocabulary here about gardening tips " +
        "and soil acidity measurements for tomato growers everywhere today"),
      3L -> "too short") // < 3 words: no signature, no row
      .toDF("doc_id", "text")
    val got = CorpusFilters.decontaminateFuzzy(corpus, evalDocs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("matched_bands"), r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(got(1L) == ((4L, true)), "verbatim copy collides on every band")
    assert(got(2L) == ((0L, false)), "disjoint shingles share no band")
    assert(!got.contains(3L), "sub-shingle docs have no signature")
  }

  test("unigram seed: hand-computed substring counts; trainer seed rule " +
    "matches the distributed unigramSeed frame") {
    import spark.implicits._
    val docs = Seq(1L -> "aa aa ab").toDF("doc_id", "text")
    val seed = graft.operators.TextAnalysis.unigramSeed(docs, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    // words: aa (wc 2), ab (wc 1); substrings weighted by wc:
    // a: 2·2 + 1 = 5, aa: 2, ab: 1, b: 1
    assert(seed == Map("a" -> 5L, "aa" -> 2L, "ab" -> 1L, "b" -> 1L), seed)
  }

  test("unigram vocab: hand-computed EM round (Viterbi E-step in integer " +
    "micro-nats, char floor, prune keeps every char)") {
    import spark.implicits._
    val docs = Seq(1L -> "aa aa ab").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.unigramVocab(docs, vocabSize = 3,
        maxPieceLen = 2, emIters = 1, seedSize = 16)
      .collect().map(r => (r.getString(0), r.getAs[Long]("cnt"),
        r.getAs[Double]("score")))
    // seed probs 5/9, 2/9, 1/9, 1/9 -> costs 587787, 1504077, 2197225,
    // 2197225 µnats; Viterbi: "aa" -> [a,a] (1175574 < 1504077),
    // "ab" -> [ab] (2197225 < 2785012); usage a:4, ab:1, char floor b:1;
    // prune to 3 keeps chars a,b + best non-char ab; total 6
    assert(got.toSeq == Seq(
      ("a", 4L, -0.405465), ("ab", 1L, -1.791759), ("b", 1L, -1.791759)),
      got.toSeq)
  }

  test("unigram encode: tokens under the trained vocab, digest in doc " +
    "order; every word re-concatenates (n_tokens between words and chars)") {
    import spark.implicits._
    val docs = Seq(1L -> "aa aa ab").toDF("doc_id", "text")
    val vocab = graft.operators.TextAnalysis.unigramVocab(docs, vocabSize = 3,
      maxPieceLen = 2, emIters = 1, seedSize = 16)
    val got = graft.operators.TextAnalysis.unigramEncode(docs, vocab)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_unigram_tokens"), r.getAs[String]("tok_digest")))
    // costs from {a:4, ab:1, b:1}: "aa" -> [a,a] (810930 < no aa piece),
    // "ab" -> [ab] (1791759 < 2197224) => "a a a a ab"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("a a a a ab".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got.toSeq == Seq((1L, 5L, md)), got.toSeq)

    // real corpus: deterministic across runs; 1 <= fertility (tokens per
    // word) and tokens never exceed characters (full-coverage invariant)
    Tables.register(spark, sfDir)
    val d = spark.table("documents").limit(50)
    val v = graft.operators.TextAnalysis.unigramVocab(d, vocabSize = 64)
    val e1 = graft.operators.TextAnalysis.unigramEncode(d, v).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_unigram_tokens"),
        r.getAs[String]("tok_digest"))).sortBy(_._1)
    val e2 = graft.operators.TextAnalysis.unigramEncode(d, v).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_unigram_tokens"),
        r.getAs[String]("tok_digest"))).sortBy(_._1)
    assert(e1.toSeq == e2.toSeq)
    val bounds = d.select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), '[a-z]+', 0)"))
          .cast("long").as("nw"),
        length(regexp_replace(lower(col("text")), "[^a-z]", ""))
          .cast("long").as("nc"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    e1.foreach { case (id, nt, _) =>
      val (nw, nc) = bounds(id)
      assert(nt >= nw && nt <= nc, s"doc $id: $nt tokens vs $nw words/$nc chars")
    }
  }

  test("tokenizer compare: per-language fertilities of BPE and unigram " +
    "side by side, both >= 1 over the corpus sample") {
    Tables.register(spark, sfDir)
    val d = spark.table("documents")
    val got = graft.operators.TextAnalysis.tokenizerCompare(d,
        graft.operators.TextAnalysis.bpeMerges(d, merges = 3),
        graft.operators.TextAnalysis.unigramVocab(d, vocabSize = 64))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("bpe_fertility") >= 1.0, r)
      assert(r.getAs[Double]("unigram_fertility") >= 1.0, r)
      assert(r.getAs[Long]("n_unigram_tokens") >= r.getAs[Long]("n_words"), r)
    }
  }

  test("unigram encode UNK fallback: a character the vocab does not cover " +
    "passes through as its own piece instead of killing the job") {
    import spark.implicits._
    // train on a q-less corpus, encode a word containing 'q'
    val train = Seq(1L -> "aa aa ab").toDF("doc_id", "text")
    val vocab = graft.operators.TextAnalysis.unigramVocab(train, vocabSize = 3,
      maxPieceLen = 2, emIters = 1, seedSize = 16)
    val docs = Seq(2L -> "aqb").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.unigramEncode(docs, vocab)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_unigram_tokens"), r.getAs[String]("tok_digest")))
    // vocab {a, ab, b} has no 'q' and no piece spans it -> [a, q, b]
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("a q b".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq((2L, 3L, md)), got.toSeq)
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("wordpiece encode: greedy longest-match-first with ## markers; a " +
    "stuck word collapses WHOLE to [UNK], not a partial segmentation") {
    import spark.implicits._
    val vocab = Seq("un", "able", "a", "b", "l", "e", "u", "n")
      .map(p => (p, 1L)).toDF("piece", "cnt")
    val docs = Seq(1L -> "unable zap").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.wordpieceEncode(docs, vocab)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_wp_tokens"), r.getAs[Long]("n_unk_words"),
        r.getAs[String]("tok_digest")))
    // "unable" -> un ##able; "zap" has no 'z' anywhere -> [UNK] (1 token)
    assert(got.toSeq ==
      Seq((1L, 3L, 1L, md5Of("un ##able [UNK]"))), got.toSeq)
  }

  test("wordpiece encode is GREEDY, not optimal: a longer first piece wins " +
    "even when it forces single-char continuations") {
    import spark.implicits._
    val vocab = Seq("una", "un", "able", "a", "b", "l", "e", "u", "n")
      .map(p => (p, 1L)).toDF("piece", "cnt")
    val docs = Seq(1L -> "unable").toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.wordpieceEncode(docs, vocab)
      .collect().head
    // greedy takes "una" at position 0 (longest), leaving b-l-e as chars;
    // the optimal "un ##able" (2 tokens) is NOT what WordPiece produces
    assert(got.getAs[Long]("n_wp_tokens") == 4L, got)
    assert(got.getAs[String]("tok_digest") == md5Of("una ##b ##l ##e"), got)
  }

  test("wordpiece vocab: every corpus character survives even at " +
    "vocabSize=1 (the coverage floor); top pieces follow the seed rule") {
    import spark.implicits._
    val docs = Seq(1L -> "abc abc xy").toDF("doc_id", "text")
    val v = graft.operators.TextAnalysis.wordpieceVocab(docs, vocabSize = 1,
        maxPieceLen = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // chars always present; the single top slot is the (cnt desc, piece
    // asc) argmax: 'a','b','c' all have cnt 2 -> 'a' is already a char
    assert(Set("a", "b", "c", "x", "y").subsetOf(v.keySet), v)
    assert(v("a") == 2L && v("x") == 1L, v)
    // no piece longer than 1 sneaks in past the top-1 slot unless it IS
    // the top: top-1 at maxPieceLen=3 is 'a' (cnt 2, lexicographically
    // first among cnt-2 pieces like 'ab','abc','b','bc','c')
    assert(v.keySet.filter(_.length > 1).isEmpty, v)
  }

  test("textrank keywords: short words filtered BEFORE adjacency (they " +
    "bridge, not block), symmetric components settle at uniform rank, " +
    "maxEdges keeps the heaviest pair deterministically") {
    import spark.implicits._
    val docs = Seq(
      1L -> "alpha the beta alpha beta",  // 'the' < 4 chars: filtered, so
                                          // alpha-beta adjacency bridges it
      2L -> "gamma delta gamma"
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.textrankKeywords(docs, topK = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // two symmetric 2-node components over 4 nodes: every rank stays at
    // the uniform 1/4 fixed point; order is rank desc then keyword asc
    assert(got == Seq("alpha" -> 0.25, "beta" -> 0.25,
      "delta" -> 0.25, "gamma" -> 0.25), got)
    val capped = graft.operators.TextAnalysis.textrankKeywords(docs,
        topK = 10, maxEdges = 1)
      .collect().map(_.getString(0)).toSet
    // alpha-beta (cnt 3: a-b, b-a, a-b) outweighs delta-gamma (cnt 2)
    assert(capped == Set("alpha", "beta"), capped)
  }

  test("wordpiece fertility: per-stratum rollup with unk_rate golden") {
    import spark.implicits._
    val vocab = Seq("ab", "a", "b").map(p => (p, 1L)).toDF("piece", "cnt")
    val docs = Seq(
      (1L, "ab ab", "en"),   // 2 words, 2 tokens, 0 unk
      (2L, "aab zz", "de")   // aab -> ab? greedy: "ab"? pos0 'aa' no,
                             // 'a' yes -> a ##ab = 2 toks; zz -> [UNK]
    ).toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.wordpieceFertility(docs, vocab)
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == Seq(
      ("de", 2L, 3L, 1.5, 1L, 0.5),
      ("en", 2L, 2L, 1.0, 0L, 0.0)), got)
  }

  test("wordpiece merge scores: freq(ab)/(freq(a)*freq(b)) ranks a rare " +
    "but exclusive pair above a frequent promiscuous one") {
    import spark.implicits._
    // corpus: 'abab' x4, 'xy' x1 over distinct words weighted by count.
    // symbols: a=8, b=8, x=1, y=1. pairs: (a,b)=8 (two per 'abab', x4),
    // (b,a)=4, (x,y)=1. scores: xy = 1/(1*1) = 1 -> TOP despite count 1;
    // ab = 8/64 = 0.125; ba = 4/64 = 0.0625. BPE's raw-frequency
    // criterion would pick (a,b) first — the discriminating case.
    val docs = (Seq.fill(4)("abab") ++ Seq("xy")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.wordpieceMergeScores(docs, topK = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(6))).toSeq
    assert(got == Seq(
      (1L, "x", "y", 1L, 1.0e9),
      (2L, "a", "b", 8L, 0.125e9),
      (3L, "b", "a", 4L, 0.0625e9)), got)
  }

  test("wordpiece iterated merges: round 2 re-scores AFTER round 1's " +
    "winner is merged (xy collapses to one symbol, then ab wins)") {
    import spark.implicits._
    val docs = (Seq.fill(4)("abab") ++ Seq("xy")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.wordpieceMerges(docs, merges = 2)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSeq
    // round 1: xy (score 1) merges; round 2: 'xy' is ONE symbol now, so
    // the only pairs left are (a,b)=8 and (b,a)=4 over a=8, b=8
    assert(got == Seq(
      (1, "x", "y", 1L, 1L, 1L, 1.0e9),
      (2, "a", "b", 8L, 8L, 8L, 0.125e9)), got)
  }

  test("seqPack: concat-and-chunk spans boundaries, empty docs occupy no " +
    "chunk; the two-phase prefix sum is partition-count independent") {
    import spark.implicits._
    // doc 2 is EMPTY text, doc 5 is NULL text: both must count as zero
    // tokens and occupy no chunk — the empty case guards tokenization
    // ([""] would be 1 token), the NULL case guards the partition sums
    // (a NULL sum would NPE the driver's offset fold)
    val docs = Seq((1L, "a b c"), (2L, ""), (3L, "d e f g"),
      (4L, "h"), (5L, null: String)).toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CorpusFilters.seqPack(d, seqLen = 4).orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5))).toSeq
    // tokens 3/0/4/1/0 → starts 0/3/3/7/8; chunks of 4: doc1 [0,2]→chunk
    // 0, doc2 none, doc3 [3,6]→chunks 0–1 (SPANS the boundary), doc4
    // [7]→1, doc5 none
    val expect = Seq(
      (1L, 3L, 0L, 0L, 0L, 1L),
      (2L, 0L, 3L, -1L, -1L, 0L),
      (3L, 4L, 3L, 0L, 1L, 2L),
      (4L, 1L, 7L, 1L, 1L, 1L),
      (5L, 0L, 8L, -1L, -1L, 0L))
    assert(run(docs) == expect, run(docs))
    // the global result must not depend on the incoming partitioning
    assert(run(docs.repartition(8)) == expect)
    assert(run(docs.coalesce(1)) == expect)
  }

  test("seqChunks: slices tile every chunk to exactly seqLen tokens " +
    "(tail excepted), boundary docs split at chunk edges, offsets are " +
    "contiguous within a chunk") {
    import spark.implicits._
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val ch = CorpusFilters.seqChunks(docs, seqLen = 64)
    val rows = ch.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // slice lengths are positive and chunk-bounded
    assert(rows.forall(r => r._5 >= 1 && r._5 <= 64), "slice lens")
    val byChunk = rows.groupBy(_._1)
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (cid, rs) =>
      val total = rs.map(_._5).sum
      if (cid < lastChunk) assert(total == 64L, s"chunk $cid sums $total")
      else assert(total <= 64L, s"tail chunk sums $total")
      // ordered by chunk_off the slices are contiguous from 0
      val sorted = rs.sortBy(_._3)
      assert(sorted.head._3 == 0L, s"chunk $cid starts at offset 0")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 + a._5 == b._3,
          s"chunk $cid gap between ${a._2} and ${b._2}")
        case _ =>
      }
    }
    // total slice tokens == total corpus tokens (nothing lost or duped)
    val totalTokens = CorpusFilters.seqPack(docs, seqLen = 64)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(rows.map(_._5).sum == totalTokens)
    // a boundary doc reconstructs: its slices are contiguous in
    // doc_slice_start order and cover [0, n_tokens)
    val spanning = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(spanning.nonEmpty, "fixture has boundary docs")
    spanning.foreach { case (_, rs) =>
      val s = rs.sortBy(_._4)
      assert(s.head._4 == 0L)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4)
        case _ =>
      }
    }
  }

  test("piiCards: Luhn gate separates real PANs from lookalikes and " +
    "redacts only the valid ones") {
    import spark.implicits._
    val docs = Seq(
      // valid 16-digit Visa (spaces) + checksum-failing twin (hyphens)
      1L -> "pay 4111 1111 1111 1111 or 4111-1111-1111-1112 today",
      // valid 15-digit Amex, bare
      2L -> "amex 378282246310005 works",
      // 11-digit Luhn-valid classic — too short to be a PAN, not even a
      // candidate; 20-digit run — no word-bounded 13-19 digit match
      3L -> "ref 79927398713 and 12345678901234567890 ignored",
      // candidate count includes the invalid; valid count does not
      4L -> "maybe 1234 5678 9012 3456 hmm",
      5L -> "no digits at all here")
      .toDF("doc_id", "text")
    val got = CorpusFilters.piiCards(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_candidates"), r.getAs[Long]("n_valid_cards"),
          r.getAs[String]("redacted_digest")))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 1L)
    assert(got(2L)._1 == 1L && got(2L)._2 == 1L)
    assert(got(3L) == ((0L, 0L, md5Hex(
      "ref 79927398713 and 12345678901234567890 ignored"))))
    assert(got(4L)._1 == 1L && got(4L)._2 == 0L)
    assert(got(5L) == ((0L, 0L, md5Hex("no digits at all here"))))
    // only the Luhn-valid candidate is redacted; the lookalike survives
    assert(got(1L)._3 == md5Hex(
      "pay <CARD> or 4111-1111-1111-1112 today"))
    assert(got(2L)._3 == md5Hex("amex <CARD> works"))
    assert(got(4L)._3 == md5Hex("maybe 1234 5678 9012 3456 hmm"))
  }

  test("blocklistGate: case-insensitive token-anchored words and phrases; " +
    "substring decoys never hit; maxHits thresholds; empty list keeps all") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Win at CASINO BONUS and more casino bonus offers"), // phrase x2
      (2L, "the scasino and xxxy decoys stay clean"),
      (3L, "one viagra mention"),
      (4L, "totally clean prose"))
      .toDF("doc_id", "text")
    val words = Seq("viagra", "casino bonus", "xxx")
    val got = CorpusFilters.blocklistGate(docs, words).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_blocked"), r.getAs[Boolean]("keep")))).toMap
    assert(got(1L) == ((2L, false)))
    assert(got(2L) == ((0L, true)))
    assert(got(3L) == ((1L, false)))
    assert(got(4L) == ((0L, true)))
    // CCNet-style rate thresholding instead of C4's zero-tolerance
    val lax = CorpusFilters.blocklistGate(docs, words, maxHits = 1L)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(lax(1L) == false && lax(3L) == true)
    val none = CorpusFilters.blocklistGate(docs, Seq.empty).collect()
    assert(none.forall(_.getAs[Boolean]("keep")))
    // non-token entries are refused, not silently mis-matched
    intercept[IllegalArgumentException] {
      CorpusFilters.blocklistGate(docs, Seq("bad.regex*")).collect()
    }
  }

  test("piiReport: per-source totals, any-PII doc count, and rate") {
    import spark.implicits._
    val docs = Seq(
      ("a", 1L, "mail me u@example.com and v@example.org"), // 2 emails
      ("a", 2L, "from 10.0.0.1 today"),                     // 1 ip
      ("a", 3L, "clean"),
      ("b", 4L, "card 4111 1111 1111 1111 tel +4915112345670"), // 1 card + 1 phone
      ("b", 5L, "clean too"))
      .toDF("source", "doc_id", "text")
    val got = CorpusFilters.piiReport(docs).orderBy("source").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("docs"), r.getAs[Long]("docs_with_pii"),
          r.getAs[Long]("emails"), r.getAs[Long]("ips"),
          r.getAs[Long]("phones"), r.getAs[Long]("cards"),
          r.getAs[Double]("pii_rate")))).toMap
    assert(got("a") == ((3L, 2L, 2L, 1L, 0L, 0L, 0.6667)))
    assert(got("b") == ((2L, 1L, 0L, 0L, 1L, 1L, 0.5)))
  }

  test("cardValid: property check against an independent local Luhn " +
    "over random digit strings of every PAN-relevant length") {
    import spark.implicits._
    def luhnLocal(ds: String): Boolean = {
      val sum = ds.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      ds.length >= 13 && ds.length <= 19 && sum % 10 == 0
    }
    val rnd = new scala.util.Random(4217)
    val cases = (1 to 200).map { _ =>
      val len = 11 + rnd.nextInt(10) // 11..20: straddles both bounds
      (1 to len).map(_ => rnd.nextInt(10)).mkString
    } ++ Seq("4111111111111111", "378282246310005", "79927398713")
    val got = cases.toDF("ds")
      .select(col("ds"), CorpusFilters.cardValid(col("ds")).as("v"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { ds => assert(got(ds) == luhnLocal(ds), ds) }
  }

  test("piiCards: many candidates per document fold correctly") {
    import spark.implicits._
    // 40 valid + 40 invalid candidates in one doc: counts and the
    // redaction fold must handle candidate-dense documents
    val many = (1 to 40)
      .map(_ => "4111 1111 1111 1111 and 4111-1111-1111-1112").mkString(" ")
    val got = CorpusFilters.piiCards(Seq((1L, many)).toDF("doc_id", "text"))
      .collect().head
    assert(got.getAs[Long]("n_candidates") == 80L)
    assert(got.getAs[Long]("n_valid_cards") == 40L)
    assert(got.getAs[String]("redacted_digest") == md5Hex(
      (1 to 40).map(_ => "<CARD> and 4111-1111-1111-1112").mkString(" ")))
  }

  test("luhnChecksum: textbook checksum values") {
    import spark.implicits._
    val got = Seq("79927398713", "4111111111111111", "378282246310005",
      "4111111111111112")
      .toDF("ds")
      .select(col("ds"), CorpusFilters.luhnChecksum(col("ds")).as("c"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("79927398713") % 10 == 0)
    assert(got("4111111111111111") % 10 == 0)
    assert(got("378282246310005") % 10 == 0)
    assert(got("4111111111111112") % 10 != 0)
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
}
