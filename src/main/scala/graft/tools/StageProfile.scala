package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution for one SparkEntry query: runs it once warm,
  * once measured, and prints each stage's task CPU, wall span, input
  * and shuffle volumes with the first line of its name — the probe the
  * r10 verdict asked for to name where `bm25_search_stored`-class
  * task-CPU goes (scan width vs scoring vs shuffle serialization).
  *
  * Usage: runMain graft.tools.StageProfile <query> [sfDir]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.SparkUtil.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Agg(var cpuNs: Long = 0, var runMs: Long = 0,
        var inMb: Double = 0, var shRdMb: Double = 0, var shWrMb: Double = 0,
        var spillMb: Double = 0, var tasks: Int = 0, var name: String = "")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, Agg]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit = {
        stages.computeIfAbsent(e.stageInfo.stageId, _ => Agg())
          .name = e.stageInfo.name.linesIterator.next()
      }
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          val a = stages.computeIfAbsent(e.stageId, _ => Agg())
          a.synchronized {
            a.cpuNs += m.executorCpuTime
            a.runMs += m.executorRunTime
            a.inMb += m.inputMetrics.bytesRead / 1e6
            a.shRdMb += (m.shuffleReadMetrics.localBytesRead +
              m.shuffleReadMetrics.remoteBytesRead) / 1e6
            a.shWrMb += m.shuffleWriteMetrics.bytesWritten / 1e6
            a.spillMb += (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6
            a.tasks += 1
          }
        }
      }
    })

    def once(): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    once() // warm: JIT, codegen, store builds
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    try org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
    catch { case _: java.util.concurrent.TimeoutException => () }
    stages.clear()
    val t0 = System.nanoTime()
    once()
    val wall = (System.nanoTime() - t0) / 1e9
    try org.apache.spark.GraftBusDrain.drain(spark.sparkContext)
    catch { case _: java.util.concurrent.TimeoutException => () }

    import scala.jdk.CollectionConverters._
    val rows = stages.asScala.toSeq.sortBy(-_._2.cpuNs)
    println(f"STAGEPROFILE $name wall=$wall%.2f s, measured run (post-warm)")
    println("stageId  cpu_s  run_s  tasks  in_mb  shRd_mb  shWr_mb  spill_mb  name")
    rows.foreach { case (id, a) =>
      println(f"$id%7d  ${a.cpuNs / 1e9}%5.2f  ${a.runMs / 1e3}%5.2f  ${a.tasks}%5d  " +
        f"${a.inMb}%5.0f  ${a.shRdMb}%7.1f  ${a.shWrMb}%7.1f  ${a.spillMb}%8.0f  ${a.name}")
    }
    println(f"TOTAL cpu=${rows.map(_._2.cpuNs).sum / 1e9}%.2f s over ${rows.size} stages")
    spark.stop()
  }
}
