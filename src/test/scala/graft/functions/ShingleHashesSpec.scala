package graft.functions

import graft.SparkFunSuite
import graft.functions.ShingleHashes.shingle_hashes
import org.apache.spark.sql.functions._

/** The native per-row distinct-shingle-hash expression against the
  * explode → substring → md5 → distinct formulation it replaced:
  * identical hash sets on the real corpus and on multi-byte text
  * (shingles are CHAR-based, like `substring(text, i, n)`), output
  * sorted ascending and duplicate-free by construction. */
class ShingleHashesSpec extends SparkFunSuite {
  import spark.implicits._

  /** doc_id → sorted distinct head-60 hashes via the naive shape. */
  private def naive(docs: org.apache.spark.sql.DataFrame, n: Int): Map[Long, Seq[Long]] =
    docs
      .select(col("doc_id"),
        explode(expr(s"sequence(1, greatest(length(text)-${n - 1}, 1))")).as("i"),
        col("text"))
      .select(col("doc_id"),
        conv(substring(md5(expr(s"substring(text, i, $n)").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .groupBy("doc_id").agg(sort_array(collect_list(col("h"))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

  private def fast(docs: org.apache.spark.sql.DataFrame, n: Int): Map[Long, Seq[Long]] =
    docs.select(col("doc_id"), shingle_hashes(col("text"), lit(n)).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap

  test("shingle_hashes(text, 12) equals the explode+distinct formulation on the real corpus") {
    val docs = graft.util.Tables.documents(spark, "/root/testdata/sf0.001")
    val f = fast(docs, 12)
    assert(f.nonEmpty && f == naive(docs, 12))
  }

  test("multi-byte, short, and empty texts match substring semantics") {
    val docs = Seq(
      (1L, "héllo wörld ünïcode ßtring"),
      (2L, "ab"),            // shorter than a shingle → one clipped shingle
      (3L, ""),              // empty → hash of the empty shingle
      (4L, "日本語のテキストです"),
      (5L, "aaaaaaaaaaaaaaaaaaaa") // heavy in-row duplication → one hash
    ).toDF("doc_id", "text")
    val f = fast(docs, 12)
    assert(f == naive(docs, 12))
    assert(f(5L).length == 1, "repeated shingles must dedupe in-row")
  }

  test("output is sorted and duplicate-free; callable from plain SQL; width varies") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql("SELECT shingle_hashes(text, 5) AS hs FROM sh_docs")
      .collect().head.getSeq[Long](0).toList
    assert(viaSql == viaSql.distinct && viaSql == viaSql.sorted)
    assert(fast(docs, 5)(1L) == viaSql)
    assert(fast(docs, 5) == naive(docs, 5), "n=5 must follow the same semantics as n=12")
  }

  test("null text yields null, not a crash") {
    val docs = Seq((1L, Option("abc def ghi jkl")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"), shingle_hashes(col("text"), lit(12)).as("hs"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(rows(1L) != null && rows(2L) == null)
  }
}
