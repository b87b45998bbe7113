package graft.tools

/** Dev tool: print candidate-pair counts (k8 + oph) and doc counts for
  * a list of SF dirs — the output-mass denominators SCALING.md cites. */
object PairCount {
  def main(args: Array[String]): Unit = {
    val s = graft.util.SparkUtil.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val docs = graft.util.Tables.documents(s, d).count()
      val k8 = graft.operators.SignatureStore.ensureK8Pairs(s, d).count()
      val oph = graft.operators.SignatureStore.ensureOphPairs(s, d).count()
      println(f"PAIRS $d docs=$docs k8=$k8 oph=$oph")
    }
    s.stop()
  }
}
