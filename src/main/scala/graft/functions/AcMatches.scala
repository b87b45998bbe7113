package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `ac_matches(text, patterns)` — which of a FIXED phrase list occur as
  * substrings of `text`, as one Aho–Corasick automaton pass per row
  * (Aho & Corasick, CACM 1975), returned as the sorted distinct array
  * of 0-based pattern indexes.
  *
  * This is the 100 TB shape of blocklist/phrase filtering. The
  * declarative spelling is a containment JOIN — `documents × phrases ON
  * contains(text, phrase)` — which no engine can turn into anything
  * better than |corpus|·|phrases| substring scans (it is a theta-join;
  * at 10k blocklist phrases that is 10k full-text passes per document).
  * The automaton reads each document's bytes ONCE regardless of phrase
  * count: O(bytes + matches), with the phrase list compiled into a trie
  * with failure links at expression-construction time (patterns must be
  * FOLDABLE — a literal array — which is what a blocklist is; the
  * compiled automaton rides to executors inside the expression and into
  * generated code as a codegen reference object, so the scan stays in
  * whole-stage codegen: one virtual call per row).
  *
  * Matching is on raw UTF-8 bytes, exact for substring semantics (a
  * valid-UTF-8 needle occurs in a valid-UTF-8 haystack iff the byte
  * sequence occurs — multi-byte sequences are self-synchronizing), so
  * results equal `contains(text, p)` per pattern: the oracle's spelling.
  * Overlapping and nested patterns all report (the dictionary-suffix
  * closure is folded into each node's output set at build time). Null
  * text → null; empty or null patterns fail at build (an empty needle
  * "matches" everywhere — a blocklist bug, rejected loudly).
  *
  * Reference anchor: the reference's label pipeline greps fixed marker
  * strings in Python (`icecube/labels/create_labels.py` substring
  * checks); this is that capability as a distributed single-pass scan.
  */
case class AcMatches(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "ac_matches patterns must be foldable (a literal array) — the " +
            "automaton is compiled once at plan time")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ac_matches expects (string, array<string>), got ($l, $r)")
    }

  /** Compiled once per plan on the driver; @transient so executors
    * rebuild from the serialized literal (cheap, once per task). */
  @transient private lazy val automaton: AhoCorasick = AcMatches.compile(right)

  override def nullSafeEval(text: Any, pats: Any): Any =
    automaton.matches(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, (text, _) => s"${ev.value} = $acRef.matches($text);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AcMatches {
  private[functions] def compile(patternsExpr: Expression): AhoCorasick = {
    val arr = patternsExpr.eval(null).asInstanceOf[ArrayData]
    require(arr != null, "ac_matches: patterns array is null")
    val pats = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < pats.length) {
      require(!arr.isNullAt(i), s"ac_matches: pattern $i is null")
      val p = arr.getUTF8String(i).getBytes
      require(p.nonEmpty, s"ac_matches: pattern $i is empty — an empty " +
        "needle matches everywhere")
      pats(i) = p
      i += 1
    }
    new AhoCorasick(pats)
  }

  /** Column-API entry point — resolves through the session function
    * registry, so [[graft.GraftExtensions]] must be installed. */
  def ac_matches(text: Column, patterns: Column): Column =
    call_function("ac_matches", text, patterns)
}

/** The classic byte-level Aho–Corasick automaton: trie + BFS failure
  * links, with each node's output set closed over dictionary suffix
  * links at build time so matching never chases them. Goto edges are
  * per-node sorted parallel arrays (bytes/targets) probed by binary
  * search — compact at blocklist scale (memory ∝ total pattern bytes,
  * not ×256) and cache-friendly for the fanouts real phrase lists have.
  * Serializable: one instance rides inside the expression to executors
  * and into generated code as a reference object. */
final class AhoCorasick(patterns: Array[Array[Byte]]) extends Serializable {

  private val nPatterns = patterns.length

  // one build pass: trie (TreeMap edges) → BFS failure links with
  // output sets closed over them → frozen sorted parallel arrays
  private val (edgeBytes, edgeTo, failLink, outSets) = {
    import scala.collection.mutable
    val edges = mutable.ArrayBuffer(mutable.TreeMap.empty[Int, Int]) // byte(0..255) -> node
    val out = mutable.ArrayBuffer(List.empty[Int])
    var pi = 0
    while (pi < nPatterns) {
      var node = 0
      val p = patterns(pi)
      var k = 0
      while (k < p.length) {
        val b = p(k) & 0xff
        node = edges(node).getOrElse(b, {
          edges += mutable.TreeMap.empty[Int, Int]
          out += Nil
          val nw = edges.length - 1
          edges(node).put(b, nw)
          nw
        })
        k += 1
      }
      out(node) ::= pi
      pi += 1
    }
    val fail = new Array[Int](edges.length)
    val queue = mutable.Queue.empty[Int]
    edges(0).valuesIterator.foreach { c => fail(c) = 0; queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      edges(u).foreach { case (b, v) =>
        var f = fail(u)
        while (f != 0 && !edges(f).contains(b)) f = fail(f)
        val t = edges(f).getOrElse(b, 0)
        fail(v) = if (t != v) t else 0
        out(v) = out(v) ++ out(fail(v)) // BFS order: fail(v) already closed
        queue += v
      }
    }
    val eb = new Array[Array[Byte]](edges.length)
    val et = new Array[Array[Int]](edges.length)
    var n = 0
    while (n < edges.length) {
      val es = edges(n).toArray // TreeMap: already byte-sorted
      eb(n) = es.map(_._1.toByte)
      et(n) = es.map(_._2)
      n += 1
    }
    (eb, et, fail, out.map(_.toArray.sorted).toArray)
  }

  private def goTo(node: Int, b: Byte): Int = {
    val bs = edgeBytes(node)
    var lo = 0
    var hi = bs.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val cmp = (bs(mid) & 0xff) - (b & 0xff)
      if (cmp == 0) return edgeTo(node)(mid)
      else if (cmp < 0) lo = mid + 1
      else hi = mid - 1
    }
    -1
  }

  /** Sorted distinct indexes of patterns occurring in `text`. Called
    * from both the interpreted path and generated code. */
  def matches(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val seen = new Array[Boolean](nPatterns)
    var nSeen = 0
    var state = 0
    var i = 0
    while (i < bytes.length && nSeen < nPatterns) {
      val b = bytes(i)
      var t = goTo(state, b)
      while (state != 0 && t < 0) { state = failLink(state); t = goTo(state, b) }
      state = if (t >= 0) t else 0
      val o = outSets(state)
      var k = 0
      while (k < o.length) {
        if (!seen(o(k))) { seen(o(k)) = true; nSeen += 1 }
        k += 1
      }
      i += 1
    }
    val res = new Array[Any](nSeen)
    var p = 0
    var j = 0
    while (j < nPatterns) {
      if (seen(j)) { res(p) = j; p += 1 }
      j += 1
    }
    new GenericArrayData(res)
  }
}
