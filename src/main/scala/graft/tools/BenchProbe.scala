package graft.tools

import org.apache.spark.sql.SparkSession

/** Focused wall/CPU probe for attributing bench inflation: times a
  * comma-separated list of SparkEntry queries (args(0)) in a FRESH JVM
  * with the same methodology as [[graft.Bench]] (noop sink, best-of-N,
  * store prebuild, bus-drain barrier) but without the other ~100
  * queries' accumulated driver/listener state. If a query that inflated
  * in the full bench is fast here on the identical plan, the inflation
  * is run-accumulated driver overhead, not the query.
  *
  * Also the generalized SPILL audit (r13 verdict #5): every rep prints
  * the task-metrics spill meter (memory + disk bytes spilled) next to
  * cpu, and an optional 4th arg overrides the shuffle partition count —
  * the BitextProbe knob that separates plan cpu (partition-invariant)
  * from spill cpu (falls as partitions shrink task state below the
  * executor-memory waterline).
  *
  * Usage: runMain graft.tools.BenchProbe q1,q2[,...] [reps] [sfDir] [shufflePartitions]
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = if (args.length > 3) args(3) else cpus
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
          spillBytes.addAndGet(
            e.taskMetrics.memoryBytesSpilled + e.taskMetrics.diskBytesSpilled)
        }
    })
    def drain(): Unit =
      try org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
      catch { case _: java.util.concurrent.TimeoutException => () }

    // same prebuilds the bench does for the stored/ivf paths
    graft.SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    locally {
      import org.apache.spark.sql.functions.col
      val e = graft.util.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val centroids = e.orderBy("vec_id").limit(16)
        .select(col("vec_id").as("cent_id"), col("embedding").as("cv"))
      graft.operators.SignatureStore.ensureIvfAssignments(spark, sfDir,
        () => graft.operators.VectorQueries.ivfAssign(e, centroids)).write
        .format("noop").mode("overwrite").save()
    }

    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        drain(); cpuNs.set(0); spillBytes.set(0)
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val tBuild = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        val cpu = cpuNs.get / 1e9
        val spillMb = spillBytes.get / 1e6
        // BLOCKING unpersist + a GC nudge between reps: async unpersist
        // let rep N+1 start while rep N's checkpoint blocks and
        // ContextCleaner-pending shuffle files still held the spill
        // volume — at the bitext 100× point the second rep died on
        // ENOSPC under ~60 GB of rep-1 leftovers
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        (wall, cpu, (tBuild - t0) / 1e6, spillMb)
      }
      val best = times.minBy(_._1)
      println(f"PROBE $n%-24s best_wall=${best._1}%.3f cpu=${best._2}%.2f " +
        f"spill_mb=${best._4}%.0f parts=$parts%s " +
        f"build_ms=${best._3}%.0f all=${times.map(t => f"${t._1}%.2f/${t._3}%.0f/${t._4}%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
