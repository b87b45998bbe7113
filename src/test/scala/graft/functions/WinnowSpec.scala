package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The winnowing selector: brute-force agreement, the density bounds,
  * and the SIGMOD-2003 locality guarantee on planted documents. */
class WinnowSpec extends SparkFunSuite {
  import spark.implicits._

  private val K = 5
  private val W = 4

  /** Reference implementation, independently written: positional md5
    * head-60 gram hashes, rightmost-min per window, position dedup. */
  private def brute(s: String): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(x: String): Long = {
      md.reset()
      val d = md.digest(x.getBytes("UTF-8"))
      var h = 0L
      for (b <- 0 until 7) h = (h << 8) | (d(b) & 0xFFL)
      (h << 4) | ((d(7) & 0xFF) >>> 4)
    }
    val g = math.max(s.length - (K - 1), 1)
    val hs = (1 to g).map(i => h60(s.substring(i - 1, math.min(i - 1 + K, s.length))))
    val nw = math.max(g - (W - 1), 1)
    val picks = (0 until nw).map { j =>
      val end = math.min(j + W, g)
      // rightmost min
      (j until end).minBy(t => (hs(t), -t))
    }
    picks.distinct.map(hs)
  }

  private def viaSpark(docs: Seq[String]): Seq[Seq[Long]] = {
    val df = docs.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    df.select(col("id"),
        WinnowFingerprints.winnow_fingerprints(col("s"), lit(K), lit(W)).as("fps"))
      .orderBy("id").collect()
      .map(_.getSeq[Long](1).toSeq).toSeq
  }

  test("matches the brute-force reference on random strings") {
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(60) { i =>
      val len = 1 + rnd.nextInt(120)
      // small alphabet forces hash ties, exercising the rightmost rule
      Seq.fill(len)("abcab".charAt(rnd.nextInt(5))).mkString
    }
    val got = viaSpark(docs)
    docs.zip(got).foreach { case (s, fps) =>
      assert(fps == brute(s), s"mismatch for '$s'")
    }
  }

  test("density sits within [1/w, 1] and near 2/(w+1) on random text") {
    val rnd = new scala.util.Random(13)
    val s = Seq.fill(20000)(('a' + rnd.nextInt(26)).toChar).mkString
    val fps = viaSpark(Seq(s)).head
    val nw = s.length - (K - 1) - (W - 1)
    val density = fps.size.toDouble / nw
    assert(density >= 1.0 / W && density <= 1.0)
    // expected 2/(w+1) = 0.4; allow generous slack for one sample
    assert(math.abs(density - 0.4) < 0.05, s"density $density far from 0.4")
  }

  test("locality guarantee: a shared substring of length >= w+k-1 " +
      "yields a shared fingerprint; disjoint docs share nothing") {
    val rnd = new scala.util.Random(99)
    def rand(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val shared = rand(W + K - 1) // exactly the guarantee threshold (8 chars)
    val a = rand(40) + shared + rand(40)
    val b = rand(40) + shared + rand(40)
    val Seq(fa, fb) = viaSpark(Seq(a, b))
    assert(fa.toSet.intersect(fb.toSet).nonEmpty,
      s"guarantee violated for shared '$shared'")
    // two independent random docs: no shared 5-gram → no shared print
    val c = rand(200)
    val d = rand(200).map(ch => (((ch - 'a') + 13) % 26 + 'A').toChar) // disjoint alphabet
    val Seq(fc, fd) = viaSpark(Seq(c, d))
    assert(fc.toSet.intersect(fd.toSet).isEmpty)
  }

  test("degenerate inputs: shorter than k, shorter than w grams, empty") {
    val got = viaSpark(Seq("", "ab", "abcdef"))
    // every doc yields at least one fingerprint (single clipped gram /
    // single window)
    got.foreach(fps => assert(fps.nonEmpty))
    // 'abcdef': 2 grams, 1 window → exactly one selected
    assert(got(2).size == 1)
  }
}
