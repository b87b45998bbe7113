package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The native kernel must agree with the relational spelling it replaced
  * (substring + ord deltas) for every shape: short payloads, exact
  * multiples, ragged tails, non-ASCII codepoints. */
class FramePairDiffsSpec extends SparkFunSuite {
  import spark.implicits._

  /** Brute-force reference: codepoint frames of width 32. */
  private def brute(s: String): Seq[(Long, Long)] = {
    val cps = s.codePoints().toArray
    val nf = cps.length / 32
    (0 until math.max(nf - 1, 0)).map { i =>
      val d = (0 until 32).map(p => math.abs(cps(i * 32 + p) - cps(i * 32 + 32 + p)).toLong).sum
      (i.toLong, d)
    }
  }

  test("agrees with the relational spelling on varied payloads") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq(
      "", "short", "x" * 31, "y" * 32, "z" * 63, "w" * 64, "v" * 65,
      (0 until 200).map(i => ('a' + i % 26).toChar).mkString,
      "é" * 70 + "ü" * 30, // non-ASCII codepoints
      rnd.alphanumeric.take(321).mkString)
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("doc_id", "text")
    val got = graft.operators.Multimodal.frameDiffs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = payloads.zipWithIndex.flatMap { case (p, i) =>
      brute(p).map { case (idx, d) => (i.toLong, idx, d) }
    }.toSet
    assert(got == want)
  }

  test("the kernel is a stateless map: no window, no aggregate, no exchange") {
    val df = Seq((1L, "a" * 96)).toDF("doc_id", "text")
    val plan = graft.operators.Multimodal.frameDiffs(df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Exchange")
      && !plan.contains("Aggregate"), s"kernel must stay map-only:\n$plan")
    assert(plan.contains("Generate"), s"expected the generator shape:\n$plan")
  }
}
