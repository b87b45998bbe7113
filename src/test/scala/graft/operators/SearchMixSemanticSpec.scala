package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantic + plan-shape pins for the round-4 additions: BM25 search,
  * temperature mixture sampling, and SemDeDup-style semantic dedup.
  * Value correctness is hash-checked by the DuckDB oracle gate; these
  * pin the invariants and 100 TB plan shapes the oracle can't see. */
class SearchMixSemanticSpec extends SparkFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("bm25_search: k bound per query, no query doc in results, broadcast-pruned plan") {
    val df = SearchQueries.defs("bm25_search").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the query-vocabulary prune and the qid attach must broadcast — the
    // corpus-side aggregate shuffles only matched terms
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val perQid = rows.groupBy(_.getAs[Long]("qid"))
    perQid.foreach { case (_, rs) => assert(rs.length <= 5) }
    // corpus excludes the query set, so no result doc is an eval doc
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0))
    assert(rows.forall(_.getAs[Long]("score") > 0))
  }

  test("mix_temperature: the largest source keeps every doc; rates are monotone") {
    val docs = graft.util.Tables.documents(spark, sfDir)
    val bySource = docs.filter(col("source").isNotNull)
      .select(col("source"), size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxSource = bySource.maxBy(_._2)._1
    val kept = CurationQueries.defs("mix_temperature").build(spark, sfDir).collect()
    val keptBySource = kept.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    val totalBySource = docs.filter(col("source").isNotNull)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // sqrt(t/t_max) = 1 for the max source -> permille 1000 -> all kept
    assert(keptBySource(maxSource).toLong == totalBySource(maxSource))
    // permille monotone in source token mass
    val permille = kept.groupBy(_.getAs[String]("source")).view
      .mapValues(_.head.getAs[Long]("permille")).toMap
    val ordered = bySource.toSeq.sortBy(_._2).map(_._1).filter(permille.contains)
    ordered.sliding(2).foreach {
      case Seq(lo, hi) => assert(permille(lo) <= permille(hi))
      case _ =>
    }
  }

  test("knn_classify: predictions match a naive majority vote at spec scale") {
    val df = VectorQueries.defs("knn_classify").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // the labeled corpus must stream — only the bounded query side broadcasts
    assert(plan.contains("BroadcastNestedLoop") || plan.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$plan")
    val got = df.collect().map(r =>
      r.getAs[Long]("qid") -> (r.getAs[Int]("predicted"), r.getAs[Long]("votes"))).toMap
    val e = graft.util.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val queries = e.filter(_._1 < 100)
    val corpus = e.filter(_._1 >= 100)
    queries.foreach { case (qid, _, qv) =>
      val nn = corpus.map { case (cid, lbl, cv) => (cid, lbl, cos(qv, cv)) }
        .sortBy { case (cid, _, s) => (-s, cid) }.take(10)
      val (predicted, votes) = nn.groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (lbl, n) => (-n, lbl) }.head
      assert(got(qid) == ((predicted, votes)), s"qid $qid: got ${got(qid)}, naive ($predicted, $votes)")
    }
  }

  test("dedup_semantic: every dropped vector has a lower-id cluster-mate above threshold") {
    val df = VectorQueries.defs("dedup_semantic").build(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"within-cluster pairs must be an equi-join on cent_id:\n$plan")
    val dropped = df.collect()
    // verify against a naive in-memory check at sf0.001 scale
    val e = graft.util.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      BigDecimal(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cents = e.keys.toSeq.sorted.take(16)
    def assignOf(v: Array[Float]): Long =
      cents.map(c => (c, cos(v, e(c)))).maxBy { case (c, s) => (s, -c) }._1
    val assign = e.map { case (id, v) => id -> assignOf(v) }
    dropped.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val cid = r.getAs[Long]("cent_id")
      assert(assign(id) == cid, s"vec $id reported in cluster $cid but assigned ${assign(id)}")
      val mates = assign.collect { case (o, c) if c == cid && o < id => o }
      assert(mates.exists(o => cos(e(o), e(id)) > 0.4),
        s"vec $id dropped without a lower-id near mate")
    }
  }
}
