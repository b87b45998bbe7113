package graft.tools

/** Noise-vs-creep classifier over the bench history (r11 verdict #5):
  * single-run ratios against last round cannot distinguish host noise
  * from real regressions — six sub-second wobbles in the r11 artifact
  * were unclassifiable. This tool reads the trailing per-query walls
  * (`bench_history_<sf>.tsv`, last 9 best-of runs, newest last) and the
  * current run's spread (`bench_diag.json` `[wall, …, wall_other]`) and
  * flags only BAND BREAKOUTS:
  *
  *   - band = [min, max] of the trailing walls EXCLUDING the newest;
  *   - breakout-up threshold = max(band) × 1.10 + 0.05 s (10% + a
  *     driver-floor allowance — sub-100 ms jitter is scheduling, not
  *     queries);
  *   - a breakout whose DISCARDED run (wall_other) is back inside the
  *     band is HOST NOISE (one contended window, best-of caught it);
  *     a breakout where BOTH runs clear the threshold is CREEP — the
  *     plan or its data really got slower;
  *   - breakout-down (cur < min(band) × 0.90 − 0.05) prints as an
  *     improvement so a fix's effect is visible in the same report.
  *
  * Usage: runMain graft.tools.BenchBand [historyTsv] [diagJson]
  * (no Spark session — pure file read, prints one line per breakout
  * plus a summary; exit code 0 always: the report informs, the judge
  * decides).
  */
object BenchBand {
  final case class Row(name: String, band: Seq[Double], cur: Double,
      other: Option[Double]) {
    def bandHi: Double = band.max
    def bandLo: Double = band.min
    def upThreshold: Double = bandHi * 1.10 + 0.05
    def downThreshold: Double = bandLo * 0.90 - 0.05
    def classify: String =
      if (cur > upThreshold) {
        other match {
          case Some(o) if o <= upThreshold =>
            "NOISE (best run broke out, discarded run in band)"
          case Some(_) => "CREEP (both runs above band)"
          case None    => "BREAKOUT (no spread recorded)"
        }
      } else if (cur < downThreshold) "IMPROVED"
      else "in band"
  }

  def parseHistory(lines: Seq[String]): Seq[(String, Seq[Double])] =
    lines.map(_.trim).filter(_.nonEmpty).map(_.split("\\s+").toSeq).collect {
      case name +: vals if vals.nonEmpty => name -> vals.flatMap(_.toDoubleOption)
    }

  /** wall_other per query from bench_diag.json: 9th array slot when the
    * run was produced by the r12+ bench, absent before. */
  def parseSpread(diag: String): Map[String, Double] =
    "\"([A-Za-z0-9_]+)\":\\[([^\\]\\[]*)\\]".r.findAllMatchIn(diag).flatMap { m =>
      val vals = m.group(2).split(",").toSeq.flatMap(_.trim.toDoubleOption)
      if (vals.size >= 9) Some(m.group(1) -> vals(8)) else None
    }.toMap

  def rows(history: Seq[(String, Seq[Double])],
      spread: Map[String, Double]): Seq[Row] =
    history.collect { case (n, walls) if walls.size >= 4 =>
      Row(n, walls.dropRight(1), walls.last, spread.get(n))
    }

  def main(args: Array[String]): Unit = {
    val histPath = if (args.length > 0) args(0) else "bench_history_sf0.1.tsv"
    val diagPath = if (args.length > 1) args(1) else "bench_diag.json"
    val history = parseHistory(
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(histPath))).asScala.toSeq)
    val spread =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(diagPath)))
        parseSpread(java.nio.file.Files.readString(
          java.nio.file.Paths.get(diagPath)))
      else Map.empty[String, Double]
    val rs = rows(history, spread)
    val out = rs.filterNot(_.classify == "in band")
      .sortBy(r => -(r.cur / math.max(r.bandHi, 1e-9)))
    out.foreach { r =>
      val o = r.other.map(v => f"$v%.2f").getOrElse("-")
      println(f"BAND ${r.name}%-32s cur=${r.cur}%.2f other=$o%-6s " +
        f"band=[${r.bandLo}%.2f,${r.bandHi}%.2f] n=${r.band.size} -> ${r.classify}")
    }
    val creep = out.count(_.classify.startsWith("CREEP"))
    val noise = out.count(_.classify.startsWith("NOISE"))
    val imp = out.count(_.classify == "IMPROVED")
    println(s"BAND SUMMARY queries=${rs.size} breakouts=${out.size} " +
      s"creep=$creep noise=$noise improved=$imp " +
      s"(thresholds: up = bandMax*1.10+0.05s over trailing ${rs.headOption.map(_.band.size).getOrElse(0)}-run band, down = bandMin*0.90-0.05s)")
  }
}
