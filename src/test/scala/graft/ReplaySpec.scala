package graft

import graft.operators.Replay
import org.apache.spark.sql.functions._

/** Property pin for the replay-dedup core: [[Replay.dedupWithin]] must be
  * EXACTLY distinct() — same surviving multiset — for any partitioning key
  * that is a function of the row, because every telemetry operator's
  * correctness now rides on it (the keys only choose WHICH exchange the
  * dedup shares, never what survives). Seeded random frames with small
  * value pools (forcing byte-equal duplicates), null keys, and both
  * column and expression keys. */
class ReplaySpec extends SparkTestBase {

  test("dedupWithin ≡ distinct() over seeded random frames, any row-" +
    "function key, nulls included") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keyPool = Seq("a", "b", null, "c")
    val valPool = Seq(Some(1.5), Some(2.0), None)
    (1 to 25).foreach { trial =>
      // trial 1 pins the degenerate EMPTY frame through the window+lag
      val nRows = if (trial == 1) 0 else rnd.nextInt(40) + 1
      val rows = Seq.fill(nRows)((
        keyPool(rnd.nextInt(keyPool.size)),
        rnd.nextInt(4).toLong,
        valPool(rnd.nextInt(valPool.size))))
      val df = rows.toDF("k", "n", "v")
      val keyChoices = Seq(
        Seq(col("k")),
        Seq(col("n")),
        Seq(col("k"), col("n")),
        Seq(pmod(col("n"), lit(2))), // expression key, still a row function
        Seq(col("v")))
      val keys = keyChoices(rnd.nextInt(keyChoices.size))
      def canon(r: org.apache.spark.sql.DataFrame): Seq[String] =
        r.collect().map(_.toString).sorted.toSeq
      val got = canon(Replay.dedupWithin(df, keys))
      val want = canon(df.distinct())
      assert(got == want,
        s"trial $trial keys=${keys.mkString(",")} rows=$rows:\n$got\n$want")
    }
  }
}
