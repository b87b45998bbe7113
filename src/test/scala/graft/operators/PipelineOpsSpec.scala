package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantics + plan pins for the round-6 pipeline operators: line-level
  * dedup, balanced bins, upsampling, splits, pooling, collocations.
  */
class PipelineOpsSpec extends SparkFunSuite {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def globalWindows(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec if w.partitionSpec.isEmpty => w
    }

  test("observe(): per-stage pipeline counters ride the single pass (no recount scans)") {
    // The production-observability pattern for a 100 TB curation run:
    // counting survivors after each gate with separate .count() actions
    // would rescan the pipeline once per stage, so stage counters are
    // attached with Dataset.observe — they accumulate DURING the one
    // real action and read back from the executed plan afterwards.
    val docs = graft.util.Tables.documents(spark, sfDir)
    val ingest = docs.observe("ingest", count(lit(1)).as("n"),
      sum(col("n_chars")).as("chars"))
    val gated = ingest.filter(col("n_chars") >= 100)
      .observe("gated", count(lit(1)).as("n"))
    val out = gated.filter(col("lang") === "en")
    // the ONE action; both observers fill during it. (count() would
    // build its own QueryExecution — the metrics live on the plan that
    // actually ran, so the action must execute THIS dataset's plan.)
    val nOut = out.collect().length.toLong
    val metrics = out.queryExecution.observedMetrics
    val nIngest = metrics("ingest").getAs[Long]("n")
    val nGated = metrics("gated").getAs[Long]("n")
    assert(nIngest == docs.count())
    assert(nGated == docs.filter(col("n_chars") >= 100).count())
    assert(nIngest >= nGated && nGated >= nOut)
    assert(metrics("ingest").getAs[Long]("chars") > 0L)
  }

  test("dedup_lines: planted duplicate lines drop everywhere but their first occurrence") {
    val lineA = (1 to 10).map(i => s"a$i").mkString(" ")
    val lineB = (1 to 10).map(i => s"b$i").mkString(" ")
    val lineC = (1 to 10).map(i => s"c$i").mkString(" ")
    val lineD = (1 to 10).map(i => s"d$i").mkString(" ")
    val dir = tmpDir("linededup")
    Seq(
      (1L, s"$lineA $lineB", "en", "src1", 0L), // first occurrence of A and B
      (2L, s"$lineA $lineC", "en", "src1", 0L), // A is a cross-doc duplicate
      (3L, s"$lineD $lineD", "en", "src1", 0L)  // D duplicates within one doc
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val rows = TextQueries.defs("dedup_lines").build(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(rows(1L) == ((2L, 2L, 0L, md5Hex(s"$lineA $lineB"))))
    assert(rows(2L) == ((2L, 1L, 1L, md5Hex(lineC))))
    assert(rows(3L) == ((2L, 1L, 1L, md5Hex(lineD))))
  }

  test("dedup_lines: first-occurrence window partitions by line — never global") {
    val q = TextQueries.defs("dedup_lines").build(spark, sfDir)
    assert(globalWindows(q).isEmpty,
      s"line dedup must not funnel all lines through one task:\n${q.queryExecution.sparkPlan}")
  }

  test("dedup_lines_stored: bit-identical to live, and never re-runs the corpus-line window") {
    val live = TextQueries.defs("dedup_lines").build(spark, sfDir)
    val stored = TextQueries.defs("dedup_lines_stored").build(spark, sfDir)
    assert(stored.collect().sameElements(live.collect()),
      "stored and live line dedup must be bit-identical")
    // the stored path is registry-join only — the corpus-wide
    // first-occurrence window lives exclusively in the registry build
    val windows = stored.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      s"stored path must not re-window the line table:\n${stored.queryExecution.sparkPlan}")
  }

  test("bpe_train_k3: three merges on a hand-computable vocabulary") {
    // vocab: aaab×3, ab×2.
    //   iter1 pairs: aa 6 (two positions × 3), ab 3+2=5  → merge a+a
    //   iter2 over {␁ab×3, ab×2}: ab 5, ␁a 3            → merge a+b
    //   iter3 over {␁␂×3, ␂×2}: (␁,␂) 3                 → merge aa+ab
    // rank 3 exercises BOTH sentinel expansions (␁→"aa", ␂→"ab")
    val dir = tmpDir("bpek3")
    Seq((1L, "aaab aaab aaab ab ab", "en", "src1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val rows = CurationQueries.defs("bpe_train_k3").build(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq((1L, "a+a", 6L), (2L, "a+b", 5L), (3L, "aa+ab", 3L)))
  }

  test("pack_balanced_bins: distributed rank (no global window) and ±1-doc balance") {
    val q = CurationQueries.defs("pack_balanced_bins").build(spark, sfDir)
    assert(globalWindows(q).isEmpty,
      s"bin ranking must not use a single-partition window:\n${q.queryExecution.sparkPlan}")
    val docCounts = q.select("n_docs").collect().map(_.getLong(0))
    assert(docCounts.length == 32)
    // round-robin dealing can never leave bins more than one doc apart
    assert(docCounts.max - docCounts.min <= 1,
      s"round-robin bins must be ±1 doc balanced, got ${docCounts.mkString(",")}")
  }

  test("upsample_epochs: every doc keeps 1..4 contiguous copies; the largest source exactly 1") {
    val q = CurationQueries.defs("upsample_epochs").build(spark, sfDir)
      .groupBy("doc_id", "source", "permille")
      .agg(count(lit(1)).as("n"), max("copy_idx").as("mx"))
      .collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      val (n, mx, permille) = (r.getLong(3), r.getLong(4), r.getLong(2))
      assert(n >= 1 && n <= 4, s"copies out of the 1..4 epoch cap: $r")
      assert(mx == n - 1, s"copy_idx must be contiguous 0..n-1: $r")
      if (permille == 1000L) assert(n == 1, s"the largest source runs exactly once: $r")
    }
    assert(q.exists(_.getLong(2) == 1000L), "some source must be the largest (1.0 epochs)")
  }

  test("split_train_val: the three splits partition the corpus") {
    val rows = CurationQueries.defs("split_train_val").build(spark, sfDir).collect()
    val total = graft.util.Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("test", "train", "val"))
    assert(rows.map(_.getLong(1)).sum == total)
    // 98/1/1: train dominates
    val byName = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName("train") > byName("val") * 10 && byName("train") > byName("test") * 10)
  }

  test("embed_doc_pool: pooled vectors are unit-norm after ppm truncation") {
    // unit_x1e6 is the unit-vector component ×1e6, so Σ(unit/1e6)² ≈ 1
    val norms = VectorQueries.defs("embed_doc_pool").build(spark, sfDir)
      .groupBy("gid").agg(
        sum((col("unit_x1e6") / 1e6) * (col("unit_x1e6") / 1e6)).as("sq"),
        max("n_chunks").as("nc"))
      .collect()
    assert(norms.nonEmpty)
    norms.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 0.01, s"unit norm broken: $r")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 4)
    }
  }

  test("top-k queries stay heap-bounded: o7_top_paths and bigram_lift use TakeOrderedAndProject") {
    for (name <- Seq("o7_top_paths" -> RelationalQueries.defs, "bigram_lift" -> TextQueries.defs)) {
      val q = name._2(name._1).build(spark, sfDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"${name._1} must take its top-k via a bounded heap, not a global sort:\n$plan")
    }
  }

  test("dataset_card: dup rate and Gini agree with first principles at sf0.001") {
    val row = CurationQueries.defs("dataset_card").build(spark, sfDir).collect().head
    val docs = graft.util.Tables.documents(spark, sfDir)
    val n = docs.count()
    val nDistinct = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(row.getLong(0) == n && row.getLong(2) == nDistinct)
    val gini = {
      val cs = docs.groupBy("lang").count().collect().map(_.getLong(1))
      1.0 - cs.map(c => c.toDouble * c).sum / (n.toDouble * n)
    }
    assert(math.abs(row.getLong(7) / 1e6 - gini) < 1e-5, s"gini mismatch: $row vs $gini")
  }
}
