package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Invariants of the substring-dedup pair (span detection + excision).
  * Value correctness is hash-checked by the DuckDB oracle gate; these
  * pin the relationship BETWEEN the two queries and the naive
  * re-computation of the excision at spec scale. */
class SubstringDedupSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("excision conserves tokens and matches a naive per-doc cut") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val spans = TextQueries.substringSpans(docs).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(r =>
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toSeq).toMap
    val removal = TextQueries.defs("dedup_substring_removal").build(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed"), r.getAs[String]("cleaned_fp"))).toMap
    assert(removal.nonEmpty)
    val texts = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    removal.foreach { case (id, (nKept, nRemoved, fp)) =>
      val toks = texts(id).trim.toLowerCase.split("\\s+").toSeq
      assert(nKept + nRemoved == toks.length, s"doc $id token conservation")
      val covered = spans(id).flatMap { case (a, b) => a to b }.toSet
      val kept = toks.zipWithIndex.collect { case (t, i) if !covered(i + 1L) => t }
      assert(kept.length.toLong == nKept, s"doc $id kept count")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(kept.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(md == fp, s"doc $id cleaned fingerprint")
    }
    // every reported doc actually had a span, and n_removed matches its
    // total span coverage
    removal.keys.foreach(id => assert(spans.contains(id)))
  }

  test("span detection and excision agree on which docs are affected") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val spanDocs = TextQueries.substringSpans(docs)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val removalDocs = TextQueries.defs("dedup_substring_removal").build(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // removal reports a subset: affected docs that still have tokens left
    assert(removalDocs.subsetOf(spanDocs))
  }
}
