package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Property tests for the data-driven attribution pair and the NB
  * classifier: planted Markov chains with known absorption behavior,
  * brute-force permutation agreement for the Shapley fold, and planted
  * separable/inseparable corpora for Naive Bayes. */
class AttributionSpec extends SparkFunSuite {

  test("markovAbsorption: sole-path channel carries the full removal effect") {
    // start → a → conv for every journey: removing a must zero the
    // conversion probability; removing an absent channel changes nothing.
    val base = Seq(("start", "a", 10L), ("a", "conv", 10L))
    val pAll = RelationalQueries.markovAbsorption(base, None)
    assert(pAll === 1000000000000L) // every journey converts
    assert(RelationalQueries.markovAbsorption(base, Some("a")) === 0L)
  }

  test("markovAbsorption: split paths absorb proportionally and removal is partial") {
    // start → a → conv (3), start → b → null (1): p = 3/4 exactly.
    val base = Seq(("start", "a", 3L), ("start", "b", 1L),
      ("a", "conv", 3L), ("b", "null", 1L))
    val pAll = RelationalQueries.markovAbsorption(base, None)
    assert(pAll === 750000000000L)
    // removing b redirects start→b to null — conv paths untouched
    assert(RelationalQueries.markovAbsorption(base, Some("b")) === pAll)
    // removing a kills the only conv route
    assert(RelationalQueries.markovAbsorption(base, Some("a")) === 0L)
  }

  test("markovAbsorption: two-hop chain converges within the 8 iterations") {
    // start → a → b → conv, all mass: needs 3 hops, well under 8.
    val base = Seq(("start", "a", 5L), ("a", "b", 5L), ("b", "conv", 5L))
    assert(RelationalQueries.markovAbsorption(base, None) === 1000000000000L)
    assert(RelationalQueries.markovAbsorption(base, Some("b")) === 0L)
  }

  test("shapleyPhi matches brute-force permutation enumeration") {
    import spark.implicits._
    // complete 3-channel design: all 8 coalitions observed, arbitrary
    // monotone-ish v values (ppm) with one negative-marginal channel
    val vMap = Map(
      "" -> 0L, "a" -> 400000L, "b" -> 100000L, "c" -> 300000L,
      "a,b" -> 450000L, "a,c" -> 900000L, "b,c" -> 350000L,
      "a,b,c" -> 800000L)
    val chans = Seq("a", "b", "c")
    // brute force: φ_i·n! = Σ over the 6 orderings of the marginal
    // contribution of i when it arrives
    val brute = chans.map { i =>
      val perms = chans.permutations.toSeq
      i -> perms.map { p =>
        val before = p.takeWhile(_ != i).toSet
        val sWith = (before + i).toSeq.sorted.mkString(",")
        val sWithout = before.toSeq.sorted.mkString(",")
        vMap(sWith) - vMap(sWithout)
      }.sum
    }.toMap
    val v = vMap.toSeq.toDF("sset", "v_ppm")
    val nch = Seq(3L).toDF("n")
    val got = RelationalQueries.shapleyPhi(v, nch)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === brute)
    // efficiency axiom on the complete design: Σφ = n!·(v(N) − v(∅))
    assert(got.values.sum === 6L * (vMap("a,b,c") - vMap("")))
  }

  test("shapleyPhi: unobserved coalitions contribute v = 0") {
    import spark.implicits._
    // only the grand coalition and one singleton observed
    val v = Seq(("a,b", 600000L), ("a", 200000L)).toDF("sset", "v_ppm")
    val nch = Seq(2L).toDF("n")
    val got = RelationalQueries.shapleyPhi(v, nch)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // φ_a = w(1)·(v(a)−v(∅)) + w(2)·(v(ab)−v(b)=600000−0)
    //     = 1·200000 + 1·600000 ; φ_b = 1·(v(ab)−v(a)) = 400000
    assert(got("a") === 800000L)
    assert(got("b") === 400000L)
  }

  test("nbConfusion is diagonal on a disjoint-vocabulary corpus") {
    import spark.implicits._
    // 3 langs × 40 docs, each lang draws from its own disjoint tokens —
    // every test doc shares tokens ONLY with its own lang's train side
    val docs = (0 until 120).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val words = (0 until 6).map(j => s"w_${lang}_${(i + j) % 5}")
      (i.toLong, words.mkString(" "), lang)
    }.toDF("doc_id", "text", "lang")
    val cm = TextQueries.nbConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.nonEmpty)
    cm.foreach { case (t, p, n) => assert(t === p, s"off-diagonal $t->$p ($n)") }
    // all 3 langs appear in the held-out fifth
    assert(cm.map(_._1).toSet === Set("aa", "bb", "cc"))
  }

  test("ipfWeights converges planted margins and preserves mass direction") {
    // 2×2 with wildly unbalanced margins: rows 90/10, cols 80/20
    val cells = Seq(("a", "x", 72L), ("a", "y", 18L),
      ("b", "x", 8L), ("b", "y", 2L))
    val w = CurationQueries.ipfWeights(cells)
    val m = cells.map(_._3).sum // 100
    val target = BigInt(1000000L) * m / 2 // uniform 2-way margins
    def margin(sel: ((String, String, Long, Long)) => String): Map[String, BigInt] =
      w.groupBy(sel).map { case (k, v) =>
        k -> v.map(t => BigInt(t._3) * t._4).sum
      }
    val rows = margin(_._1)
    val cols = margin(_._2)
    // after 4 double-sweeps margins sit within 0.1% of target
    (rows.values ++ cols.values).foreach { got =>
      assert((got - target).abs * 1000 < target, s"$got vs $target")
    }
    // the scarce row's cells must be UP-weighted, the abundant row's down
    val wMap = w.map(t => (t._1, t._2) -> t._4).toMap
    assert(wMap(("b", "y")) > 1000000L && wMap(("a", "x")) < 1000000L)
  }

  test("Wilson lower bound is sandwiched and tightens with n") {
    import spark.implicits._
    val grid = for (n <- Seq(10L, 100L, 1000L, 10000L); r <- Seq(1, 5, 9))
      yield (n, n * r / 10)
    val df = grid.toDF("n", "x")
      .withColumn("rate_ppm", expr("CAST((1000000 * x) div n AS BIGINT)"))
      .withColumn("lo", expr(RelationalQueries.WilsonLowerPpmExpr))
    val rows = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    rows.foreach { case (n, x, rate, lo) =>
      assert(lo >= 0 && lo <= rate, s"n=$n x=$x: bound $lo vs rate $rate")
    }
    // fixed rate, growing n ⇒ the bound approaches the rate from below
    Seq(1, 5, 9).foreach { r =>
      val bounds = rows.filter(t => t._2 * 10 == t._1 * r).sortBy(_._1).map(_._4)
      assert(bounds.zip(bounds.tail).forall { case (a, b) => a <= b },
        s"rate ${r * 100000}: $bounds not monotone in n")
    }
  }

  test("nbConfusion falls back to the prior on an uninformative corpus") {
    import spark.implicits._
    // identical text everywhere; lang 'zz' holds 80% of BOTH splits
    // (assignment orthogonal to the doc_id%10 split) — token sums tie
    // across hypotheses, so the prior must decide: everything → 'zz'
    val docs = (0 until 100).map { i =>
      val lang = if (i % 5 != 0) "zz" else "qq"
      (i.toLong, "same same same", lang)
    }.toDF("doc_id", "text", "lang")
    val cm = TextQueries.nbConfusion(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.map(_._2).toSet === Set("zz"))
  }
}
