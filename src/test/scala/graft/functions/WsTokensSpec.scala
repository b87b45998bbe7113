package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** [[WsTokens]] / [[WsTokenCount]] must be EXACTLY
  * `split(trim(lower(text)), '\\s+')` / its `size` — every downstream
  * oracle hash rides on this tokenization, so the equivalence is
  * property-checked against the composed builtins on adversarial
  * whitespace/case/multi-byte shapes plus random strings. */
class WsTokensSpec extends SparkFunSuite {

  private val adversarial = Seq(
    null,
    "",
    " ",
    "   ",
    "\t",
    "\t \n",
    "a",
    "a b",
    "  a  b  ",
    "\ta b\n",
    "ab\fc\rd",   // vertical tab, form feed, carriage return
    "Hello WORLD",
    "MiXeD\tCaSeÉ", // É → é (multi-byte, case-mapped)
    "héllo wörld",
    "日本語 テキスト",
    "a b",          // NBSP is NOT \s in Java — must stay one token
    " x ",     // unicode line separators are NOT \s either
    "word " * 50,
    "İstanbul Iİ",  // dotted capital I: lowercase grows byte length
    "a  b   c    d",
    "trailing ws \t ",
    " \t leading")

  private def randomStrings(n: Int): Seq[String] = {
    val rnd = new java.util.Random(7)
    val alphabet = "ab YZ\t\n\f\r  éƩ中😀"
    Seq.fill(n) {
      val len = rnd.nextInt(40)
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        val c = alphabet.charAt(rnd.nextInt(alphabet.length))
        // don't split surrogate pairs
        if (!Character.isSurrogate(c)) sb.append(c) else sb.append("😀")
        i += 1
      }
      sb.toString
    }
  }

  test("ws_tokens ≡ split(trim(lower(text)), '\\\\s+') on adversarial + random strings") {
    import spark.implicits._
    val df = (adversarial ++ randomStrings(500)).toDF("text")
    val mismatches = df.select(
        col("text"),
        split(trim(lower(col("text"))), "\\s+").as("expect"),
        WsTokens.ws_tokens(col("text")).as("got"))
      .filter(!(col("expect") <=> col("got")))
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).map(_.toString).mkString("\n"))
  }

  test("ws_token_count ≡ size(split(trim(lower(text)), '\\\\s+'))") {
    import spark.implicits._
    val df = (adversarial ++ randomStrings(500)).toDF("text")
    val mismatches = df.select(
        col("text"),
        size(split(trim(lower(col("text"))), "\\s+")).as("expect"),
        WsTokenCount.ws_token_count(col("text")).as("got"))
      .filter(col("text").isNotNull) // size(null)=-1 vs null: call sites filter nulls
      .filter(!(col("expect") <=> col("got")))
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).map(_.toString).mkString("\n"))
  }

  test("ws_tokens null propagates like the builtin chain") {
    import spark.implicits._
    val row = Seq[String](null).toDF("text")
      .select(WsTokens.ws_tokens(col("text"))).collect().head
    assert(row.isNullAt(0))
  }
}
