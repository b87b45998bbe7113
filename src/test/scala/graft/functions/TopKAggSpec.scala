package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The Aggregator laws the distributed run depends on: any partitioning
  * of the input into reduce/merge trees must land on the brute-force
  * sorted top-k. Plain scalacheck generators sampled with fixed seeds
  * (scalatestplus is not on the offline classpath), so runs are
  * deterministic. */
class TopKAggSpec extends AnyFunSuite {

  private def brute(xs: Seq[ScoredId], k: Int): List[ScoredId] =
    xs.sortBy(x => (-x.v, x.id)).take(k).toList

  // small value domain on purpose: collisions exercise the tiebreak
  private val itemsGen: Gen[List[ScoredId]] = for {
    n <- Gen.choose(0, 40)
    xs <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 1000L)
      v <- Gen.choose(0, 5).map(_.toDouble)
    } yield ScoredId(id, v))
  } yield xs.distinctBy(_.id)

  private def sample[A](g: Gen[A], i: Int): A =
    g.apply(Gen.Parameters.default, Seed(0x707c4a66L + i)).get

  test("reduce-fold equals brute force for any input and k") {
    (0 until 200).foreach { i =>
      val xs = sample(itemsGen, i)
      val k = 1 + i % 6
      val agg = new TopKAgg(k)
      val folded = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x))
      assert(folded == brute(xs, k), s"case $i k=$k xs=$xs")
    }
  }

  test("merge of split halves equals whole (partition-independence)") {
    (0 until 200).foreach { i =>
      val xs = sample(itemsGen, 1000 + i)
      val k = 1 + i % 6
      val cut = if (xs.isEmpty) 0 else i % (xs.length + 1)
      val agg = new TopKAgg(k)
      val (a, b) = xs.splitAt(cut)
      val merged = agg.merge(
        a.foldLeft(agg.zero)((u, x) => agg.reduce(u, x)),
        b.foldLeft(agg.zero)((u, x) => agg.reduce(u, x)))
      assert(merged == brute(xs, k), s"case $i k=$k cut=$cut xs=$xs")
    }
  }

  test("merge is commutative and respects zero") {
    (0 until 200).foreach { i =>
      val xs = sample(itemsGen, 2000 + i)
      val ys = sample(itemsGen, 3000 + i).filterNot(y => xs.exists(_.id == y.id))
      val k = 1 + i % 6
      val agg = new TopKAgg(k)
      val bx = xs.foldLeft(agg.zero)((u, x) => agg.reduce(u, x))
      val by = ys.foldLeft(agg.zero)((u, x) => agg.reduce(u, x))
      assert(agg.merge(bx, by) == agg.merge(by, bx), s"case $i")
      assert(agg.merge(bx, agg.zero) == bx, s"case $i")
      assert(agg.merge(agg.zero, by) == by, s"case $i")
    }
  }
}
