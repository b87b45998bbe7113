package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_viterbi(word, pieces, scores, fallback)` — Viterbi
  * segmentation of `word` under a unigram language model (Kudo 2018,
  * "Subword Regularization", §3 — SentencePiece's unigram tokenizer):
  * choose the piece sequence covering the word that maximizes the summed
  * piece scores. `pieces` is the model vocabulary, `scores(i)` the score
  * of `pieces(i)`, and `fallback` the score charged to a single character
  * absent from the vocabulary (SentencePiece's unknown-piece path — the
  * segmenter is total: any string segments).
  *
  * Scores are INTEGERS, not float log-probs: the training side quantizes
  * log₂-likelihood to whole bits (`bitlen(count) − bitlen(total)`), which
  * keeps every Viterbi comparison exact integer arithmetic — the reason
  * this expression can be mirrored bit-for-bit by a DuckDB SQL oracle
  * (float `ln` differs between libm implementations in the last ulp, and
  * an argmax flipping on an ulp would diverge the engines by whole
  * pieces; see `UnigramQueries` for the full argument).
  *
  * Total deterministic order on segmentations (ties in a corpus-trained
  * model are common under 1-bit scores):
  *   1. summed score DESC;
  *   2. piece count ASC (fewest tokens);
  *   3. at each DP position, the earliest start for the final piece
  *      (i.e. the LONGEST last piece) — composable under DP, so the
  *      global optimum is unique.
  *
  * DP is O(chars × maxPieceLen) per word with hash lookups into the
  * model; the model (a literal in the plan, i.e. broadcast once per
  * task) is indexed into a hash map once per (thread, literal) via a
  * ThreadLocal cache keyed by reference identity.
  */
case class UnigramViterbi(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType) =>
        // the model must be a plan literal: the per-thread hash index is
        // keyed by ArrayData reference identity, so a per-row model would
        // silently rebuild the HashMap on every row (and a reused buffer
        // with new contents would poison the cache). Foldable children
        // fold to one Literal per plan — exactly one reference per task.
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "unigram_viterbi requires literal (foldable) pieces/scores — the " +
            "model is hash-indexed once per thread by reference, so a " +
            "per-row model would rebuild the index on every row")
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi expects (string, array<string>, array<int>, int), got $other")
    }

  override def nullSafeEval(w: Any, p: Any, s: Any, f: Any): Any =
    UnigramViterbi.segment(w.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], f.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, p, s, f) =>
      s"graft.functions.UnigramViterbi.segment($w, $p, $s, $f)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object UnigramViterbi {

  /** Hashed model: piece → score, plus the longest piece length (the DP
    * lookback bound). */
  private final class Model(pieces: ArrayData, scores: ArrayData) {
    val map = new java.util.HashMap[UTF8String, Integer](pieces.numElements() * 2)
    var maxLen = 1
    require(pieces.numElements() == scores.numElements(),
      s"unigram_viterbi: ${pieces.numElements()} pieces vs " +
        s"${scores.numElements()} scores")
    private var i = 0
    while (i < pieces.numElements()) {
      val p = pieces.getUTF8String(i)
      require(p != null && p.numChars() > 0, "unigram_viterbi: null/empty piece")
      require(map.put(p, scores.getInt(i)) == null,
        s"unigram_viterbi: duplicate piece '$p'")
      if (p.numChars() > maxLen) maxLen = p.numChars()
      i += 1
    }
  }

  // the model literal is one object reference per task; cache the hash
  // index per (thread, reference) so each row pays two pointer compares
  private val cache = new ThreadLocal[(ArrayData, ArrayData, Model)]

  private def model(pieces: ArrayData, scores: ArrayData): Model = {
    val c = cache.get()
    if (c != null && (c._1 eq pieces) && (c._2 eq scores)) c._3
    else {
      val m = new Model(pieces, scores)
      cache.set((pieces, scores, m))
      m
    }
  }

  def segment(word: UTF8String, pieces: ArrayData, scores: ArrayData,
      fallback: Int): ArrayData = {
    val m = model(pieces, scores)
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val NONE = Int.MinValue
    val bestS = new Array[Int](n + 1)
    val bestK = new Array[Int](n + 1)
    val bestL = new Array[Int](n + 1) // back-pointer: length of the last piece
    java.util.Arrays.fill(bestS, 1, n + 1, NONE)
    var j = 1
    while (j <= n) {
      val lMax = math.min(m.maxLen, j)
      var l = 1
      // l ascending = start index i descending, so replacing on a full
      // (score, count) tie keeps the SMALLEST i — the longest last piece
      while (l <= lMax) {
        val i = j - l
        if (bestS(i) != NONE) {
          val piece = word.substring(i, j)
          val sc = m.map.get(piece)
          val pieceScore =
            if (sc != null) sc.intValue()
            else if (l == 1) fallback
            else NONE
          if (pieceScore != NONE) {
            val s = bestS(i) + pieceScore
            val k = bestK(i) + 1
            if (bestS(j) == NONE || s > bestS(j) ||
                (s == bestS(j) && k <= bestK(j))) {
              bestS(j) = s; bestK(j) = k; bestL(j) = l
            }
          }
        }
        l += 1
      }
      j += 1
    }
    // single-char fallback makes every position reachable
    assert(bestS(n) != NONE, "unigram_viterbi: unreachable end position")
    val out = new Array[Any](bestK(n))
    var pos = n
    var idx = bestK(n) - 1
    while (pos > 0) {
      val l = bestL(pos)
      out(idx) = word.substring(pos - l, pos)
      idx -= 1
      pos -= l
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def unigram_viterbi(word: Column, pieces: Column, scores: Column,
      fallback: Column): Column =
    call_function("unigram_viterbi", word, pieces, scores, fallback)
}
