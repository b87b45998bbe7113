package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Isolation probe for the BT·100× "spill excess" (r12 verdict,
  * What's missing #3): the ANN bitext miner's measured second-decade
  * cpu grew ×51 vs the Θ(nprobe·N^1.5) plan's predicted ×31.6, and the
  * excess was ATTRIBUTED to single-box spill physics without an
  * isolating experiment. This tool runs the miner at a fixed corpus
  * with the two knobs that separate plan work from spill work:
  *
  *   - **shuffle partitions** (32 → 64 → 128): pure plan cpu is
  *     partition-count-invariant; spill cpu (lz4 + serialization on
  *     spill writes, re-reads on merge) FALLS as partitions shrink
  *     below the executor-memory waterline;
  *   - **shortlist t** (16 → 8): the margin tail's state is N·t — if
  *     the excess lived in the tail, halving t would halve it; if it
  *     lives in the candidate windows (the N^1.5 mass itself), t barely
  *     moves the needle.
  *
  * Prints one line per rep: wall, task-cpu, input MB, spill MB (memory
  * + disk bytes spilled, the direct spill meter). cpu is the number to
  * compare — wall on a shared box wobbles.
  *
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.BitextProbe
  *   <sfDir> <shufflePartitions> <shortlist> [reps]"
  */
object BitextProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val parts = args(1).toInt
    val shortlist = args(2).toInt
    val reps = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val spillBytes = new java.util.concurrent.atomic.AtomicLong
    val inBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null) {
          cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
          spillBytes.addAndGet(e.taskMetrics.memoryBytesSpilled + e.taskMetrics.diskBytesSpilled)
          inBytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
        }
    })
    def drain(): Unit =
      try org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
      catch { case _: java.util.concurrent.TimeoutException => () }

    (1 to reps).foreach { rep =>
      drain(); cpuNs.set(0); spillBytes.set(0); inBytes.set(0)
      val t0 = System.nanoTime()
      val e = graft.util.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"), col("label"))
      graft.operators.VectorQueries.bitextAnnMiner(e, shortlist)
        .orderBy("xid")
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      println(f"BITEXT dir=$dir parts=$parts shortlist=$shortlist rep=$rep " +
        f"wall=$wall%.1f cpu=${cpuNs.get / 1e9}%.1f in_mb=${inBytes.get / 1e6}%.0f " +
        f"spill_mb=${spillBytes.get / 1e6}%.0f")
      // blocking unpersist + GC between reps (the bitext 100x ENOSPC
      // lesson from BenchProbe): rep N's checkpoint blocks must leave
      // the spill volume before rep N+1 fills it again
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }
    spark.stop()
  }
}
