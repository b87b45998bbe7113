package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class ZipfCorpusSpec extends AnyFunSuite {

  test("text is a pure function of doc_id (deterministic across calls)") {
    assert(ZipfCorpus.text(0L) == ZipfCorpus.text(0L))
    assert(ZipfCorpus.text(12345L) == ZipfCorpus.text(12345L))
    assert(ZipfCorpus.text(7L) != ZipfCorpus.text(8L))
  }

  test("family structure: first 5 of each 50-block are near-dups, rest are not") {
    def toks(id: Long) = ZipfCorpus.text(id).split(" ").toSeq
    def jaccard(a: Seq[String], b: Seq[String]): Double = {
      val (sa, sb) = (a.toSet, b.toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    // members 0..4 of block 100 share the base under 5% mutation
    val base = toks(100)
    (101L to 104L).foreach { id =>
      val j = jaccard(base, toks(id))
      assert(j > 0.6, s"family member $id jaccard $j vs base")
      assert(toks(id) != base, s"member $id should be mutated")
      assert(toks(id).size == base.size, "mutation preserves length")
    }
    // non-members are unrelated (token MULTISETS overlap only via
    // shared Zipf-head types; distinct-type jaccard stays low)
    val j = jaccard(toks(105), toks(160))
    assert(j < 0.45, s"unrelated docs jaccard $j")
  }

  test("token frequencies are Zipf-shaped: head type dominates, tail is long") {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    // unrelated docs only (skip families to not double-count bases)
    (0L until 400L).filter(_ % 50 >= 5).foreach { id =>
      ZipfCorpus.text(id).split(" ").foreach(t =>
        counts(t) = counts.getOrElse(t, 0) + 1)
    }
    val total = counts.values.sum.toDouble
    val sorted = counts.toSeq.sortBy(-_._2)
    // rank-1 mass for s=1.07 over V=50k is ~8.5%; allow wide slack
    val top = sorted.head._2 / total
    assert(top > 0.04 && top < 0.20, s"rank-1 mass $top")
    // the most frequent type is the shortest word ("a" = rank 0)
    assert(sorted.head._1 == "a")
    // a real vocabulary, not the 31-token bench corpus
    assert(counts.size > 2000, s"only ${counts.size} types")
    // monotone-ish decay: rank-1 >= rank-10 >= rank-100
    val byRank = sorted.map(_._2)
    assert(byRank(0) > byRank(9) && byRank(9) > byRank(99))
  }

  test("bijective base-26 words: short head, unique, lowercase") {
    val ws = (0 until 60000).map(ZipfCorpus.word)
    assert(ws(0) == "a" && ws(25) == "z" && ws(26) == "aa")
    assert(ws.distinct.size == ws.size)
    assert(ws.take(ZipfCorpus.Vocab).forall(w => w.nonEmpty && w.length <= 4))
    assert(ws.forall(_.forall(c => c >= 'a' && c <= 'z')))
  }
}
