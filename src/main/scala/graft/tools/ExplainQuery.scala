package graft.tools

/** Dev tool: print the formatted physical plan of one or more SparkEntry
  * queries (default sf0.001) — the `.explain("formatted")` audit loop the
  * scale posture reviews run on. Not part of the driver contract.
  *
  * Usage: sbt "runMain graft.tools.ExplainQuery q1_agg chunk_documents"
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val s = graft.util.SparkUtil.local("explain")
    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg")
    for (n <- names) {
      println(s"\n===== $n =====")
      val df = graft.SparkEntry.queries(n)(s, d)
      df.explain("formatted")
    }
    s.stop()
  }
}
