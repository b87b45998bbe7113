package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Property tests for [[GraphQueries.triangleStats]] on planted graphs
  * where the exact answer is known in closed form. */
class GraphSpec extends SparkFunSuite {

  private def pairsDf(edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("doc_a", "doc_b")
  }

  test("planted K4 clique: every node has C(3,2)=3 triangles and coefficient 1") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val rows = GraphQueries.triangleStats(pairsDf(k4)).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(r.getAs[Long]("deg") == 3L)
      assert(r.getAs[Long]("n_triangles") == 3L)
      assert(r.getAs[Long]("clustering_ppm") == 1000000L, r.toString)
    }
  }

  test("path graph has zero triangles; star center has coefficient 0") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val rows = GraphQueries.triangleStats(pairsDf(path ++ star)).collect()
    assert(rows.forall(_.getAs[Long]("n_triangles") == 0L))
    val center = rows.find(_.getAs[Long]("doc_id") == 10L).get
    assert(center.getAs[Long]("deg") == 4L)
    assert(center.getAs[Long]("clustering_ppm") == 0L)
    // deg-1 leaves are excluded (coefficient undefined below deg 2)
    assert(!rows.exists(_.getAs[Long]("doc_id") == 11L))
  }

  test("degree cap excises the hub but keeps the residual graph's triangles") {
    // a K3 plus a hub wired to 30 leaves: uncapped, the hub's wedge join
    // is the quadratic term; capped, the K3 still counts
    val k3 = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val hub = (1L to 30L).map(i => (100L, 100L + i))
    val rows = GraphQueries.triangleStats(pairsDf(k3 ++ hub)).collect()
    assert(!rows.exists(_.getAs[Long]("doc_id") == 100L), "hub must be capped out")
    val k3rows = rows.filter(_.getAs[Long]("doc_id") < 3L)
    assert(k3rows.length == 3 &&
      k3rows.forall(_.getAs[Long]("clustering_ppm") == 1000000L))
  }
}
