package graft

import graft.streaming.CorpusStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** Streaming corpus curation: cross-batch dedup state, the map-only
  * quality gate on a streaming plan, and windowed corpus telemetry. */
class CorpusStreamsSpec extends SparkTestBase {

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  // >= 50 words, mean word length in [3,10], >= 2 stop words, alphabetic
  private val goodText = Array.fill(10)(
    "the quick brown foxes have jumped over that lazy sleeping dog")
    .mkString(" ")

  test("streaming doc dedup: replays across micro-batches are suppressed " +
    "within the watermark") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStreams.dedupDocStream(
        in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("docdedup")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData((1L, ts(0), "alpha body"), (2L, ts(1), "beta body"))
    in.addData((3L, ts(2), "alpha body"), (4L, ts(3), "gamma body"))
    val run = q.start(); run.awaitTermination(60000)
    val kept = spark.table("docdedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    // doc 3 replays doc 1's body inside the 10-minute watermark -> dropped
    assert(kept == Set(1L, 2L, 4L), s"got $kept")
  }

  test("quality gate is a map-only streaming WHERE: passing docs flow, " +
    "junk is dropped, caller columns survive") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStreams.qualityGate(in.toDF().toDF("doc_id", "ts", "text"))
      .writeStream.format("memory").queryName("qgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      (1L, ts(0), goodText),
      (2L, ts(0), "tiny doc"),                        // too few words
      (3L, ts(0), Array.fill(60)("#tag...").mkString(" "))) // symbol junk
    val run = q.start(); run.awaitTermination(60000)
    val rows = spark.table("qgate")
    assert(rows.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(rows.columns.toSeq == Seq("doc_id", "ts", "text"),
      "gate must preserve the caller's schema")
  }

  /** A w×8 PNG whose row-y gray values are `grays(y)(x)` (r=g=b). */
  private def png(grays: Array[Array[Int]]): Array[Byte] = {
    val h = grays.length; val w = grays(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = grays(y)(x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("streaming image dedup gate: an exact replay and a Hamming-1 " +
    "near-dup die against the released corpus's dHash bands; a fresh " +
    "image flows; caller schema survives") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{MediaItem, Multimodal}
    // 9x8 so the dHash NN grid samples pixels 1:1 — gradients are exact.
    // A: rising rows (all 64 bits set); B: A with ONE comparison flipped
    // (Hamming 1 -> shares 3 of 4 bands -> must drop); C: falling rows
    // (all bits clear -> no band in common with A -> must flow)
    val aG = Array.tabulate(8, 9)((_, x) => x * 10)
    val bG = Array.tabulate(8, 9)((y, x) =>
      if (y == 0 && x == 1) 0 else x * 10) // gray(0)(1) <= gray(0)(0)
    val cG = Array.tabulate(8, 9)((_, x) => 80 - x * 10)
    val corpus = Seq(MediaItem(1L, "image", png(aG))).toDS()
    val corpusHashes = Multimodal.imageDHash(corpus)
    // precondition: A/B truly Hamming 1, A/C share no band
    val ha = corpusHashes.collect().head.getAs[Long]("dhash")
    val hb = Multimodal.dHash64(MediaItem(0L, "image", png(bG)))
    val hc = Multimodal.dHash64(MediaItem(0L, "image", png(cG)))
    assert(java.lang.Long.bitCount(ha ^ hb) == 1, s"$ha vs $hb")
    assert((0 until 4).forall(b =>
      ((ha >>> (16 * b)) & 0xffffL) != ((hc >>> (16 * b)) & 0xffffL)))

    val in = MemoryStream[MediaItem]
    val q = CorpusStreams.imageDedupGate(in.toDS(), corpusHashes)
      .writeStream.format("memory").queryName("imggate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      MediaItem(100L, "image", png(aG)),  // exact replay -> drop
      MediaItem(101L, "image", png(bG)),  // near-dup (Hamming 1) -> drop
      MediaItem(102L, "image", png(cG)))  // fresh -> flows
    val run = q.start(); run.awaitTermination(60000)
    val out = spark.table("imggate")
    assert(out.columns.toSeq == Seq("media_id", "media_type", "content"),
      "gate must preserve the item schema")
    val kept = out.select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(102L), s"got $kept")
  }

  test("image dedup gate completeness: every image the batch near-dup " +
    "pairing would match against the corpus is dropped by the gate") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.operators.{MediaItem, Multimodal}
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").orderBy("doc_id").limit(10)
    val corpus = Multimodal.pngFromDocuments(docs)
    val corpusHashes = Multimodal.imageDHash(corpus)
    // the same ten images re-crawled under new ids: all exact near-dups
    val replayed = corpus.collect().map(m =>
      MediaItem(m.media_id + 100, m.media_type, m.content))
    val in = MemoryStream[MediaItem]
    val q = CorpusStreams.imageDedupGate(in.toDS(), corpusHashes)
      .writeStream.format("memory").queryName("imggate2")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(replayed.toIndexedSeq)
    val run = q.start(); run.awaitTermination(60000)
    assert(spark.table("imggate2").count() == 0L)
  }

  test("streaming url dedup gate: canonical variants of crawled pages are " +
    "not re-fetched; fresh and unparseable urls flow") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = Seq("http://example.com/a?utm_source=x").toDF("url")
    val in = MemoryStream[(Long, String)]
    val q = CorpusStreams.urlDedupGate(in.toDF().toDF("doc_id", "url"), corpus)
      .writeStream.format("memory").queryName("urlgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      (1L, "HTTP://WWW.Example.COM:80/a#frag"), // canonical dup -> drop
      (2L, "http://example.com/b"),             // fresh -> flows
      (3L, "not a url"))                        // unparseable -> flows
    val run = q.start(); run.awaitTermination(60000)
    val kept = spark.table("urlgate").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"got $kept")
  }

  test("streaming robots gate: blocked frontier URLs drop by the RFC 9309 " +
    "verdict (wildcard + Allow precedence live in the stream); verdicts " +
    "equal batch robotsFilter for every arriving URL") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rules = graft.operators.WebFilters.robotsRules(Seq(
      ("w.org", "User-agent: *\nDisallow: /\nAllow: /pub/\nDisallow: /*.pdf$")
    ).toDF("host", "body"))
    val in = MemoryStream[(Long, String)]
    val frontier = in.toDF().toDF("doc_id", "url")
    val q = CorpusStreams.robotsGate(frontier, rules)
      .writeStream.format("memory").queryName("robogate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    val arrivals = Seq(
      (1L, "http://w.org/private/x"),   // Disallow: / -> drops
      (2L, "http://w.org/pub/doc"),     // Allow: /pub/ outranks -> flows
      (3L, "http://w.org/pub/doc.pdf"), // wildcard *.pdf$ (len 7) beats
                                        // Allow /pub/ (len 5) -> drops
      (4L, "http://other.org/x"))       // no robots -> flows
    in.addData(arrivals)
    val run = q.start(); run.awaitTermination(60000)
    val kept = spark.table("robogate").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L), s"got $kept")
    // stream ≡ batch: the gate's kept set is exactly batch robotsFilter's
    val batchKept = graft.operators.WebFilters
      .robotsFilter(arrivals.toDF("doc_id", "url"), rules)
      .where(!col("robots_blocked")).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(kept == batchKept, s"stream $kept vs batch $batchKept")
    // caller schema survives: a frontier carrying its OWN host column
    // (e.g. an upstream partitioner's) keeps it through the gate
    val withHost = arrivals.toDF("doc_id", "url")
      .withColumn("host", concat(lit("shard-"), col("doc_id") % 2))
    val gated = CorpusStreams.robotsGate(withHost, rules)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("host"))).toSeq
    assert(gated == Seq((2L, "shard-0"), (4L, "shard-0")), gated.toList)
  }

  test("warcHttp runs unchanged on a live archive stream (map-only, no " +
    "state): per-record verdicts equal the batch gate's") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def warc(i: Int, p: String) =
      s"WARC/1.0\nWARC-Target-URI: https://x.org/$i\n\n$p\n\n"
    val files = Seq(
      (1L, warc(1, "HTTP/1.1 200 OK\nContent-Type: text/html\n\n<html>a</html>") +
        warc(2, "HTTP/1.1 200 OK\nContent-Type: image/png\n\nPNG")),
      (2L, warc(3, "HTTP/1.1 503 Unavailable\nContent-Type: text/html\n\ndown") +
        warc(4, "no envelope")))
    val in = MemoryStream[(Long, String)]
    val q = graft.operators.WebFilters
      .warcHttp(in.toDF().toDF("file_id", "body"))
      .writeStream.format("memory").queryName("httpgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(files)
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("httpgate")
      .orderBy("file_id", "rec_idx")
      .select("file_id", "rec_idx", "http_status", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))
      .toSeq
    assert(got == Seq(
      (1L, 1L, Some(200), true), (1L, 2L, Some(200), false),
      (2L, 1L, Some(503), false), (2L, 2L, None, false)), got)
    // stream ≡ batch on the same bytes
    val batch = graft.operators.WebFilters
      .warcHttp(files.toDF("file_id", "body"))
      .orderBy("file_id", "rec_idx")
      .select("file_id", "rec_idx", "http_status", "keep").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))
      .toSeq
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("transcode gate: live page bytes decode by the declared charset, " +
    "unhonorable labels drop; verdicts equal the batch operator's") {
    import spark.implicits._
    import java.nio.charset.StandardCharsets
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    val pages = Seq(
      (1L, "café latin".getBytes(StandardCharsets.ISO_8859_1), "latin-1"),
      (2L, "café utf8".getBytes(StandardCharsets.UTF_8), "utf-8"),
      (3L, b("he said hi"), "windows-1252"),
      (4L, b("bad é bytes"), "utf-8"), // malformed-labeled-utf8: drops
      (5L, b("mystery"), "shift_jis")) // unknown label: drops
    val in = MemoryStream[(Long, Array[Byte], String)]
    val q = graft.streaming.CorpusStreams
      .transcodeGate(in.toDF().toDF("doc_id", "body_bytes", "charset"))
      .writeStream.format("memory").queryName("tcgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(pages)
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("tcgate").orderBy("doc_id")
      .select("doc_id", "charset_used", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "iso-8859-1", "café latin"),
      (2L, "utf-8", "café utf8"),
      (3L, "windows-1252", "he said “hi”")), got)
    // gate ≡ batch operator's decode_ok slice on the same bytes
    val batch = graft.operators.WebFilters
      .transcode(pages.toDF("doc_id", "body_bytes", "charset"))
      .where(col("decode_ok")).orderBy("doc_id")
      .select("doc_id", "charset_used", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("mojibake gate: flagged rows repair in place on a live feed, " +
    "clean rows pass byte-identical; equals the batch operator") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "donâ€™t â€” cafÃ© fixed"),
      (2L, "plain ascii stays"),
      (3L, "cafÃ© cafÃ© 中文 mixed")) // flagged but non-latin-1: untouched
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams
      .mojibakeGate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("mjgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(docs)
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("mjgate").orderBy("doc_id")
      .select("doc_id", "text", "repaired").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got == Seq(
      (1L, "don’t — café fixed", true),
      (2L, "plain ascii stays", false),
      (3L, "cafÃ© cafÃ© 中文 mixed", false)), got)
    // gate ≡ batch operator on the same rows
    val batch = graft.operators.WebFilters
      .mojibakeRepair(docs.toDF("doc_id", "text")).orderBy("doc_id")
      .select(col("doc_id"), col("text_repaired").as("text"),
        col("repaired")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got == batch, s"stream $got vs batch $batch")
  }

  test("pii gate: emails/ips/phones and Luhn-valid cards scrub in place " +
    "on a live feed; lookalikes survive; n_pii counts all four types") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Seq(
      (1L, "mail u@example.com from 10.0.0.1 card 4111 1111 1111 1111"),
      (2L, "lookalike 4111-1111-1111-1112 stays put"),
      (3L, "clean text flows through"),
      // a BARE unseparated PAN also matches the phone pattern — the
      // count must see ONE entity (cards redact before phones count)
      (4L, "bare 4111111111111111 pan"))
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams
      .piiGate(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("piigate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(docs)
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("piigate").orderBy("doc_id")
      .select("doc_id", "text", "n_pii").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (1L, "mail <EMAIL> from <IP> card <CARD>", 3L),
      (2L, "lookalike 4111-1111-1111-1112 stays put", 0L),
      (3L, "clean text flows through", 0L),
      (4L, "bare <CARD> pan", 1L)), got)
  }

  test("imageTextAlignment runs on a live media stream against static " +
    "captions (stream-static equi-join): per-item verdicts equal the " +
    "batch gate's") {
    import spark.implicits._
    import graft.operators.MediaItem
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    Tables.register(spark, sfDir)
    val docs = spark.table("documents").orderBy("doc_id").limit(6)
    val items = graft.operators.Multimodal.pngFromDocuments(docs).collect()
    val captions = spark.table("documents")
    val in = MemoryStream[MediaItem]
    val q = graft.operators.Multimodal
      .imageTextAlignment(in.toDS(), captions, threshold = 0.0)
      .writeStream.format("memory").queryName("aligngate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(items.toSeq)
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("aligngate").orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    val batch = graft.operators.Multimodal
      .imageTextAlignment(items.toSeq.toDS(), captions, threshold = 0.0)
      .orderBy("media_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSeq
    assert(got.nonEmpty && got == batch, s"stream $got vs batch $batch")
  }

  test("recrawl gate: new and changed pages flow with their status, " +
    "byte-identical refetches and unparseable URLs drop; verdicts equal " +
    "the batch crawlDelta's for every arriving URL") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = Seq(
      (1L, "http://s.org/same", "alpha"),
      (2L, "http://s.org/edit", "old text"),
      // duplicate canonical in the snapshot: keep-first (min id) digest
      (9L, "http://s.org/dup?utm_source=x", "from nine"),
      (4L, "http://www.s.org/dup", "from four")
    ).toDF("doc_id", "url", "text")
    val in = MemoryStream[(Long, String, String)]
    val q = CorpusStreams.recrawlGate(
        in.toDF().toDF("fetch_id", "url", "text"), prev)
      .writeStream.format("memory").queryName("recrawl")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      (10L, "HTTP://s.org:80/same#f", "alpha"),    // canonical variant,
                                                   // same bytes -> drops
      (11L, "http://s.org/edit", "new text"),      // changed -> flows
      (12L, "http://s.org/born", "hi"),            // new -> flows
      (13L, "http://s.org/dup", "from four"),      // equals the KEEPER's
                                                   // digest -> drops
      (14L, "not a url", "x"))                     // unparseable -> drops
    val run = q.start(); run.awaitTermination(60000)
    val got = spark.table("recrawl").select("fetch_id", "status").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((11L, "changed"), (12L, "new")), s"got $got")
    // batch equivalence: crawlDelta on the same frames agrees per URL
    val curr = Seq(
      (10L, "http://s.org/same", "alpha"), (11L, "http://s.org/edit", "new text"),
      (12L, "http://s.org/born", "hi"), (13L, "http://s.org/dup", "from four")
    ).toDF("doc_id", "url", "text")
    val delta = graft.operators.WebFilters.crawlDelta(prev, curr)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(delta("http://s.org/edit") == "changed" &&
      delta("http://s.org/born") == "new" &&
      delta("http://s.org/same") == "unchanged" &&
      delta("http://s.org/dup") == "unchanged", delta)
  }

  test("windowed corpus stats: per-(window, lang) docs and token mass") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String, String)]
    val q = CorpusStreams.corpusStats(
        in.toDF().toDF("doc_id", "ts", "lang", "text"))
      .writeStream.format("memory").queryName("cstats")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    in.addData(
      (1L, ts(0), "en", "one two three"),
      (2L, ts(0), "en", "four five"),
      (3L, ts(0), "de", "eins zwei"),
      (4L, ts(5), "en", "six"))
    val run = q.start(); run.awaitTermination(60000)
    val rows = spark.table("cstats").collect()
      .map(r => (r.getAs[String]("lang"),
        r.getAs[Timestamp]("window_start").toString,
        r.getAs[Long]("docs"), r.getAs[Long]("tokens"))).toSet
    assert(rows == Set(
      ("en", "2026-01-01 10:00:00.0", 2L, 5L),
      ("de", "2026-01-01 10:00:00.0", 1L, 2L),
      ("en", "2026-01-01 10:05:00.0", 1L, 1L)), s"got $rows")
  }

  test("ccnet serving: the stream scored under the batch-trained LM " +
    "reproduces the batch tercile assignment; unseen terms land in tail") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    Tables.register(spark, sfDir)
    val docs = spark.table("documents")
    val batch = graft.operators.TextAnalysis.perplexityBuckets(docs)
      .collect()
    val t1 = batch.head.getAs[Double]("t1")
    val t2 = batch.head.getAs[Double]("t2")
    val want = batch.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Double]("surprisal"), r.getAs[String]("bucket")))).toMap
    val (model, oov) = graft.operators.TextAnalysis.unigramModel(docs)

    val in = MemoryStream[(Long, Timestamp, String)]
    val q = CorpusStreams.surprisalBucketStream(
        in.toDF().toDF("doc_id", "ts", "text"), model, oov, t1, t2)
      .writeStream.format("memory").queryName("ccnetserve")
      .outputMode("complete").trigger(Trigger.AvailableNow())
    val feed = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), ts(0), r.getString(1)))
    in.addData(feed.toIndexedSeq: _*)
    // a doc of terms the LM never saw: every token costs oovNll -> the
    // maximum possible surprisal -> tail
    in.addData((-1L, ts(0), "zzqx qqzv xvqz zqxv"))
    val run = q.start(); run.awaitTermination(120000)
    val got = spark.table("ccnetserve").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("surprisal"), r.getAs[String]("bucket")))).toMap
    assert(got.size == want.size + 1)
    want.foreach { case (id, sb) =>
      assert(got(id) == sb, s"doc $id: stream ${got(id)} != batch $sb")
    }
    val (oovSurprisal, oovBucket) = got(-1L)
    assert(oovBucket == "tail")
    assert(math.abs(oovSurprisal - oov) < 1e-3,
      s"all-OOV doc surprisal $oovSurprisal != oov nll $oov")
  }

  test("corpus dedup gate: docs the released corpus already holds never " +
    "reach the sink; fresh docs flow; schema preserved; stateless") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val released = "a document the last corpus release already shipped " +
      "with plenty of words to make it realistic"
    val corpus = Seq(800L -> released).toDF("doc_id", "text")
    val in = MemoryStream[(Long, Timestamp, String)]
    val gated = CorpusStreams.corpusDedupGate(
      in.toDF().toDF("doc_id", "ts", "text"), corpus)
    val q = gated.writeStream.format("memory").queryName("corpusgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      (1L, ts(0), released), // exact re-crawl of released text -> drop
      (2L, ts(1), "genuinely new material nobody has released before"),
      (3L, ts(2), released)) // second copy also dies (no state needed)
    val run = q.start(); run.awaitTermination(60000)
    val rows = spark.table("corpusgate")
    assert(rows.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L), "released dups dropped, fresh kept")
    assert(rows.columns.toSeq == Seq("doc_id", "ts", "text"),
      "gate must preserve the caller's schema")
    // null text is a normal dedup group (the incrementalDedup convention):
    // a corpus null-text row closes the gate for null-text stream docs too
    val corpusWithNull = corpus
      .unionByName(Seq((801L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val in2 = MemoryStream[(Long, Timestamp, String)]
    val q2 = CorpusStreams.corpusDedupGate(
        in2.toDF().toDF("doc_id", "ts", "text"), corpusWithNull)
      .writeStream.format("memory").queryName("corpusgatenull")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in2.addData((10L, ts(3), null.asInstanceOf[String]),
      (11L, ts(4), "fresh text that should still flow"))
    val run2 = q2.start(); run2.awaitTermination(60000)
    assert(spark.table("corpusgatenull").select("doc_id").collect()
      .map(_.getLong(0)).toSet == Set(11L),
      "null-text stream doc must die against the corpus' null-text group")
  }

  test("decontamination gate: verbatim benchmark leaks never reach the " +
    "sink, clean and sub-shingle docs flow, schema preserved") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val benchmark = "the quick brown fox jumps over the lazy dog while " +
      "seven wizards brew strange potions under a pale winter moon tonight"
    val evalDocs = Seq(900L -> benchmark).toDF("doc_id", "text")
    val in = MemoryStream[(Long, Timestamp, String)]
    val gated = CorpusStreams.decontaminationGate(
      in.toDF().toDF("doc_id", "ts", "text"), evalDocs)
    // the gate must stay append-compatible: no aggregation, no state
    val q = gated.writeStream.format("memory").queryName("decongate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    in.addData(
      (1L, ts(0), benchmark), // verbatim leak -> all bands collide -> drop
      (2L, ts(1), "completely different prose about gardening tips and " +
        "soil acidity measurements for tomato growers everywhere today"),
      (3L, ts(2), "too short")) // sub-shingle: no signature, passes
    val run = q.start(); run.awaitTermination(60000)
    val rows = spark.table("decongate")
    assert(rows.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L), "leak dropped, clean + sub-shingle kept")
    assert(rows.columns.toSeq == Seq("doc_id", "ts", "text"),
      "gate must preserve the caller's schema")
  }

  test("temperature gate: stream membership matches the batch sample " +
    "exactly; unknown strata never pass") {
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference corpus: 90 'big' docs, 10 'small' docs
    val corpus = ((0 until 90).map(i => (i.toLong, "big")) ++
      (90 until 100).map(i => (i.toLong, "small"))).toDF("doc_id", "lang")
    val in = MemoryStream[(Long, Timestamp, String)]
    val gated = CorpusStreams.temperatureGate(
      in.toDF().toDF("doc_id", "ts", "lang"), corpus,
      alpha = 0.3, budgetDocs = 30L)
    val q = gated.writeStream.format("memory").queryName("tempgate")
      .outputMode("append").trigger(Trigger.AvailableNow())
    // live feed re-plays the corpus ids plus an unknown stratum
    in.addData((0 until 100).map(i =>
      (i.toLong, ts(i), if (i < 90) "big" else "small")) :+
      (500L, ts(100), "mystery"): _*)
    val run = q.start(); run.awaitTermination(60000)
    val streamed = spark.table("tempgate").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // batch twin over the same rows, same salt -> identical membership
    val batch = graft.operators.Sampling.temperatureSample(
        corpus, alpha = 0.3, budgetDocs = 30L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch, s"stream $streamed != batch $batch")
    assert(!streamed.contains(500L), "unknown stratum must not pass")
    assert(streamed.nonEmpty, "gate should admit the sampled share")
  }
}
