package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantic + plan-shape pins for the corpus-curation family. Value
  * correctness is hash-checked by the DuckDB oracle gate; these tests
  * pin the invariants and the 100 TB plan shapes the oracle can't see.
  */
class CurationSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = CurationQueries.defs(name).build(spark, sfDir)

  test("decontaminate_ngram broadcasts the eval side (train never shuffles for the join)") {
    val plan = q("decontaminate_ngram").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles must broadcast:\n$plan")
  }

  test("decontaminate_setsim finds EVERY >= 0.8-Jaccard pair brute force finds") {
    import org.apache.spark.sql.functions._
    // brute force: full eval x corpus token-set Jaccard, no filtering
    val toks = graft.util.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        array_distinct(split(trim(lower(col("text"))), "\\s+")).as("ts"))
    val ev = toks.filter(col("doc_id") % 97 === 0 && col("doc_id") < 10000)
      .select(col("doc_id").as("qid"), col("ts").as("qts"))
    val tr = toks.filter(col("doc_id") % 97 =!= 0)
    val brute = tr.crossJoin(ev)
      .select(col("qid"), col("doc_id"),
        size(array_intersect(col("qts"), col("ts"))).cast("long").as("ni"),
        (size(col("qts")) + size(col("ts"))).cast("long").as("nsum"))
      .withColumn("nu", col("nsum") - col("ni"))
      .filter(col("ni") * 5 >= col("nu") * 4)
      .select(col("qid"), col("doc_id"),
        expr("CAST((1000000L * ni) div nu AS BIGINT)").as("jacc_ppm"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("qid"))
      .orderBy(col("jacc_ppm").desc, col("doc_id"))
    val bruteTop = brute.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).select("qid", "doc_id", "jacc_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = q("decontaminate_setsim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == bruteTop,
      s"prefix filtering must be exhaustive: missing=${bruteTop -- got} extra=${got -- bruteTop}")
    assert(got.nonEmpty)
  }

  test("pack_sequences: offsets in range, token ranges contiguous, spans consistent") {
    val rows = q("pack_sequences").collect()
    assert(rows.nonEmpty)
    var expectedStart = 0L
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      val seqId = r.getAs[Long]("seq_id")
      val off = r.getAs[Long]("seq_offset")
      val span = r.getAs[Long]("n_seqs_spanned")
      assert(off >= 0 && off < 512)
      assert(seqId * 512 + off == expectedStart,
        s"doc ${r.getAs[Long]("doc_id")}: packing must be gapless")
      assert(span == (off + n - 1) / 512 + 1)
      expectedStart += n
    }
  }

  test("pack_sequences uses the distributed prefix sum (no single-partition window)") {
    val globalWindows = q("pack_sequences").queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty, "packing must not funnel the corpus through one task")
  }

  test("sample_stratified is deterministic and respects per-stratum rates") {
    val a = q("sample_stratified").collect().map(_.getAs[Long]("doc_id")).toSeq
    val b = q("sample_stratified").collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(a == b, "sampling must be reproducible across runs")
    // zh samples at 1000 permille: every zh doc survives
    val zhAll = graft.util.Tables.documents(spark, sfDir)
      .filter(col("lang") === "zh").count()
    val zhKept = q("sample_stratified").filter(col("lang") === "zh").count()
    assert(zhKept == zhAll)
  }

  test("sample_stratified and shard_shuffle plans contain no shuffle before the report agg") {
    val samplePlan = q("sample_stratified").queryExecution.executedPlan.toString
    // the only exchange allowed is the final presentation sort
    assert(!samplePlan.contains("hashpartitioning"),
      s"sampling is stateless per-row work — no hash shuffle expected:\n$samplePlan")
    val shardPlan = q("shard_shuffle").queryExecution.executedPlan.toString
    assert(shardPlan.contains("HashAggregate"),
      s"shard report must be a map-side-combinable aggregate:\n$shardPlan")
  }

  test("shard_shuffle covers all 16 shards and accounts for every document") {
    val rows = q("shard_shuffle").collect()
    assert(rows.map(_.getAs[Long]("shard_id")).toSet == (0L until 16L).toSet)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.util.Tables.documents(spark, sfDir).count())
  }

  test("pii_redact scan prunes to the two columns it uses") {
    val plan = q("pii_redact").queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: struct<(.*?)>".r.findFirstMatchIn(plan).map(_.group(1))
    assert(readSchema.exists(s => s.contains("doc_id") && s.contains("text")
      && !s.contains("lang") && !s.contains("source")),
      s"expected a pruned 2-column read schema, got $readSchema")
  }

  test("production xxhash64 sampling: deterministic, rate-respecting, salt-independent draws") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val rates = Map("en" -> 0, "de" -> 1000, "es" -> 500)
    val a = CurationQueries.sampleStratified(docs, "doc_id", "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = CurationQueries.sampleStratified(docs, "doc_id", "lang", rates)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b, "same salt must reproduce the same sample")
    val langs = docs.filter(col("doc_id").isin(a.toSeq: _*))
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(!langs.contains("en") && langs.contains("de"), "rates 0/1000 must be exact")
    val deAll = docs.filter(col("lang") === "de").count()
    val deKept = docs.filter(col("lang") === "de")
      .filter(col("doc_id").isin(a.toSeq: _*)).count()
    assert(deKept == deAll, "permille 1000 keeps every row")
    val other = CurationQueries.sampleStratified(docs, "doc_id", "lang", rates, salt = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != a, "a different salt draws a different sample")
  }

  test("production shardAssign covers all shards and is append-stable") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val full = CurationQueries.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet == (0L until 8L).toSet)
    // append-stability: sharding a subset assigns identical ids
    val subset = CurationQueries.shardAssign(docs.filter(col("doc_id") < 50), "doc_id", 8)
      .select("doc_id", "shard_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(subset.forall { case (id, s) => full(id) == s })
  }

  test("pack_manifest tiles every sequence exactly and agrees with pack_sequences") {
    val manifest = q("pack_manifest").collect()
    // each sequence's segments sum to 512 tokens, except the final tail
    val bySeq = manifest.groupBy(_.getAs[Long]("seq_id"))
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, rows) =>
      val total = rows.map(_.getAs[Long]("n_seg_tokens")).sum
      if (seq != lastSeq) assert(total == 512L, s"seq $seq holds $total tokens")
      else assert(total >= 1L && total <= 512L)
      // segments tile the sequence contiguously from offset 0
      val sorted = rows.sortBy(_.getAs[Long]("seq_offset"))
      assert(sorted.head.getAs[Long]("seq_offset") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("seq_offset") + a.getAs[Long]("n_seg_tokens")
            == b.getAs[Long]("seq_offset"), s"gap in seq $seq")
        case _ => ()
      }
    }
    // each doc's FIRST segment matches its pack_sequences row
    val packed = q("pack_sequences").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"))).toMap
    manifest.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, rows) =>
      val first = rows.minBy(_.getAs[Long]("seq_id"))
      assert((first.getAs[Long]("seq_id"), first.getAs[Long]("seq_offset"))
        == packed(doc), s"doc $doc manifest/pack divergence")
      assert(first.getAs[Long]("doc_offset") == 0L)
    }
  }

  test("chunk_documents covers every token with stride-48 windows") {
    val docs = graft.util.Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "size(split(trim(lower(text)), '\\\\s+')) AS n")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = q("chunk_documents").collect().groupBy(_.getAs[Long]("doc_id"))
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (doc, rows) =>
      val n = docs(doc).toLong
      val sorted = rows.sortBy(_.getAs[Long]("chunk_id"))
      // starts advance by the stride; sizes are 64 except a short tail
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("tok_start") == 1L + 48L * i)
        val len = r.getAs[Long]("n_chunk_tokens")
        assert(len == math.min(64L, n - 48L * i), s"doc $doc chunk $i len $len")
      }
      // full coverage: the last chunk reaches the final token
      val last = sorted.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("n_chunk_tokens") - 1 == n)
    }
  }

  test("pii_redact counts match the planted enrichment schedule") {
    val rows = q("pii_redact").collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_emails") == (if (id % 3 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") == (if (id % 5 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_ips") == (if (id % 7 == 0) 1L else 0L))
    }
    // the redaction must actually remove what detection counted
    val docs = graft.util.Tables.documents(spark, sfDir).count()
    assert(rows.length == docs)
  }
}
