package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BitextCorpusSpec extends AnyFunSuite {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("planted pairs cohere far above background; vectors are pure functions of id") {
    val nT = 45L // topics for a 2000-vector corpus
    assert(BitextCorpus.embedding(6L, nT).toSeq == BitextCorpus.embedding(6L, nT).toSeq)
    // a planted pair (2p, 2p+1) nearly coincides
    val pairCos = (0 until 20).map(p =>
      cos(BitextCorpus.embedding(2L * p, nT), BitextCorpus.embedding(2L * p + 1, nT)))
    assert(pairCos.forall(_ > 0.9), s"pair cosines: $pairCos")
    // same-topic non-pairs are similar but clearly below the pair band
    val sameTopic = (0 until 10).map(i =>
      cos(BitextCorpus.embedding(2L * i, nT),
        BitextCorpus.embedding(2L * (i + nT), nT))) // p and p+nT share p % nT
    assert(sameTopic.forall(c => c > 0.4 && c < 0.93), s"same-topic: $sameTopic")
    // cross-topic vectors are near-orthogonal on average
    val cross = (0 until 20).map(i =>
      cos(BitextCorpus.embedding(2L * i, nT), BitextCorpus.embedding(2L * (i + 7) + 1, nT)))
    assert(math.abs(cross.sum / cross.size) < 0.4, s"cross-topic mean: ${cross.sum / cross.size}")
  }

  test("labels: parity selects the miner's side, quotient spreads classes") {
    // mirrors the main()'s label expression
    def label(id: Long) = (id % 2 + 2 * ((id / 2) % 4)).toInt
    assert((0L until 16L).map(label).toSet.size == 8)
    assert((0L until 16L).forall(id => label(id) % 2 == id % 2))
  }
}
