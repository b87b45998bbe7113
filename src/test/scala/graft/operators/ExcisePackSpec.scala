package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The composed excision+packing tail of corpus_pipeline_full
  * ([[CurationQueries.excisePack]]) on PLANTED spans: the live synthetic
  * corpus' boilerplate cluster dissolves at the doc-level dedup stage,
  * so the driver oracle only exercises the spans-absent branch — this
  * spec pins the cutting branch (tokens inside spans removed, gutted
  * docs dropped, packing offsets computed over the CLEANED stream). */
class ExcisePackSpec extends SparkFunSuite {
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted spans are cut, gutted docs drop, offsets shift to the cleaned stream") {
    val t1 = (1 to 20).map(i => s"a$i")
    val t2 = (1 to 5).map(i => s"b$i")
    val t3 = (1 to 7).map(i => s"c$i")
    val keep = Seq(
      (1L, "en", 20L, t1), // span [3,10] → keeps 12 tokens
      (2L, "en", 5L, t2),  // span [1,5] covers everything → dropped
      (3L, "de", 7L, t3)   // no spans → untouched
    ).toDF("doc_id", "lang", "n_tokens", "tk")
    val spans = Seq(
      (1L, 3L, 10L, 1L),
      (2L, 1L, 5L, 1L)
    ).toDF("doc_id", "span_start", "span_end", "n_grams")

    val out = CurationQueries.excisePack(keep, spans)
      .orderBy("doc_id").collect()

    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L), "doc 2 must be gutted away")

    val r1 = out(0)
    val clean1 = t1.take(2) ++ t1.drop(10) // positions 1..2 and 11..20
    assert(r1.getLong(2) == 12L && r1.getLong(3) == 8L) // n_tokens, n_removed
    assert(r1.getString(6) == md5Hex(clean1.mkString(" ")))

    val r3 = out(1)
    assert(r3.getLong(2) == 7L && r3.getLong(3) == 0L)
    assert(r3.getString(6) == md5Hex(t3.mkString(" ")))
    // tok_start of doc 3 is the CLEANED 12 of doc 1, not the raw 20
    assert(r3.getLong(4) == 0L && r3.getLong(5) == 12L, s"seq offset: $r3")
  }

  test("multiple and adjacent spans per doc compose") {
    val tk = (1 to 30).map(i => s"t$i")
    val keep = Seq((1L, "en", 30L, tk)).toDF("doc_id", "lang", "n_tokens", "tk")
    // [2,9] and [10,17] adjacent (merged coverage 2..17), plus [25,28]
    val spans = Seq((1L, 2L, 9L, 1L), (1L, 10L, 17L, 1L), (1L, 25L, 28L, 1L))
      .toDF("doc_id", "span_start", "span_end", "n_grams")
    val out = CurationQueries.excisePack(keep, spans).collect().head
    val clean = tk.slice(0, 1) ++ tk.slice(17, 24) ++ tk.slice(28, 30)
    assert(out.getLong(2) == clean.length.toLong)
    assert(out.getLong(3) == 30L - clean.length)
    assert(out.getString(6) == md5Hex(clean.mkString(" ")))
  }
}
