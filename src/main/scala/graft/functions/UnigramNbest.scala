package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `unigram_nbest(word, pieces, scores, fallback)` — the top
  * [[UnigramNbest.K]] segmentations of `word` under a unigram language
  * model, in rank order, each as its pieces joined by a single space.
  * Kudo 2018's subword-regularization headline samples from the n-best
  * list (§4); this expression materializes that list DETERMINISTICALLY so
  * a DuckDB oracle can mirror it — sampling is a cheap downstream draw
  * over the returned ranks.
  *
  * Rank order is a STRICT total order on segmentations:
  *   1. summed integer score DESC (same bit-quantized scores as
  *      [[UnigramViterbi]]);
  *   2. piece count ASC;
  *   3. reversed piece-length sequence, longest-first, compared
  *      lexicographically — encoded as a key string built by PREPENDING
  *      `chr(123 − len)` per appended piece (so the LAST piece compares
  *      first, and a longer piece sorts smaller). Two distinct paths with
  *      equal score and count always differ in the key: same piece count
  *      + same length sequence ⇒ same split points ⇒ the same path.
  *
  * Rank 1 equals [[UnigramViterbi.segment]] exactly: the Viterbi
  * tie-order (fewest pieces, then longest-last-piece applied recursively)
  * IS this order restricted to the optimum (pinned by UnigramNbestSpec).
  *
  * The order is monotone under suffix-append (appending the same piece to
  * two paths at the same position preserves their order: scores shift
  * equally, counts shift equally, and the keys gain the same prefix), so
  * the beam DP is exact: every global top-K path has its prefix inside
  * the position's top-K.
  *
  * O(chars × maxPieceLen × K) per word; same foldable-model contract and
  * per-thread model cache as [[UnigramViterbi]].
  */
case class UnigramNbest(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(IntegerType, _), IntegerType) =>
        if (second.foldable && third.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          "unigram_nbest requires literal (foldable) pieces/scores — the " +
            "model is hash-indexed once per thread by reference")
      case other => TypeCheckResult.TypeCheckFailure(
        s"unigram_nbest expects (string, array<string>, array<int>, int), got $other")
    }

  override def nullSafeEval(w: Any, p: Any, s: Any, f: Any): Any =
    UnigramNbest.nbest(w.asInstanceOf[UTF8String], p.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], f.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, p, s, f) =>
      s"graft.functions.UnigramNbest.nbest($w, $p, $s, $f)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object UnigramNbest {

  /** Beam width — top-3 completes the n-best family the way OPH completed
    * minhash; the DuckDB oracle keeps `rn <= K` rows per DP block. */
  val K = 3

  private final class Model(pieces: ArrayData, scores: ArrayData) {
    val map = new java.util.HashMap[UTF8String, Integer](pieces.numElements() * 2)
    var maxLen = 1
    require(pieces.numElements() == scores.numElements(),
      s"unigram_nbest: ${pieces.numElements()} pieces vs " +
        s"${scores.numElements()} scores")
    private var i = 0
    while (i < pieces.numElements()) {
      val p = pieces.getUTF8String(i)
      require(p != null && p.numChars() > 0, "unigram_nbest: null/empty piece")
      // chr(123 - len) keys need len < 91 to stay printable-ASCII ordered
      require(p.numChars() <= 90,
        s"unigram_nbest: piece longer than 90 chars: '$p'")
      require(map.put(p, scores.getInt(i)) == null,
        s"unigram_nbest: duplicate piece '$p'")
      if (p.numChars() > maxLen) maxLen = p.numChars()
      i += 1
    }
  }

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

  /** One beam entry: path total `s`, piece count `k`, reversed-length
    * key, last-piece length `l`, and the predecessor's slot at `pos−l`. */
  private final case class Entry(s: Int, k: Int, key: String, l: Int, pred: Int)

  private val order: Ordering[Entry] = (a: Entry, b: Entry) => {
    if (a.s != b.s) java.lang.Integer.compare(b.s, a.s)
    else if (a.k != b.k) java.lang.Integer.compare(a.k, b.k)
    else a.key.compareTo(b.key) // ASCII keys: UTF-16 order = binary order
  }

  def nbest(word: UTF8String, pieces: ArrayData, scores: ArrayData,
      fallback: Int): ArrayData = {
    val m = model(pieces, scores)
    val n = word.numChars()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // beam(j): up to K best paths to position j, already rank-sorted
    val beam = new Array[Array[Entry]](n + 1)
    beam(0) = Array(Entry(0, 0, "", 0, -1))
    var j = 1
    while (j <= n) {
      val lMax = math.min(m.maxLen, j)
      val cands = scala.collection.mutable.ArrayBuffer.empty[Entry]
      var l = 1
      while (l <= lMax) {
        val i = j - l
        if (beam(i) != null) {
          val piece = word.substring(i, j)
          val sc = m.map.get(piece)
          val pieceScore =
            if (sc != null) sc.intValue()
            else if (l == 1) fallback
            else Int.MinValue
          if (pieceScore != Int.MinValue) {
            val kc = (123 - l).toChar
            var slot = 0
            while (slot < beam(i).length) {
              val e = beam(i)(slot)
              cands += Entry(e.s + pieceScore, e.k + 1, kc +: e.key, l, slot)
              slot += 1
            }
          }
        }
        l += 1
      }
      if (cands.nonEmpty) beam(j) = cands.sorted(order).take(K).toArray
      j += 1
    }
    assert(beam(n) != null, "unigram_nbest: unreachable end position")
    val out = new Array[Any](beam(n).length)
    var r = 0
    while (r < beam(n).length) {
      // walk the back-pointers from (n, slot r) to 0
      val sb = new java.lang.StringBuilder
      val segs = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
      var pos = n
      var e = beam(n)(r)
      while (pos > 0) {
        segs += word.substring(pos - e.l, pos)
        pos -= e.l
        if (pos > 0) e = beam(pos)(e.pred)
      }
      var t = segs.length - 1
      while (t >= 0) {
        sb.append(segs(t).toString)
        if (t > 0) sb.append(' ')
        t -= 1
      }
      out(r) = UTF8String.fromString(sb.toString)
      r += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def unigram_nbest(word: Column, pieces: Column, scores: Column,
      fallback: Column): Column =
    call_function("unigram_nbest", word, pieces, scores, fallback)
}
