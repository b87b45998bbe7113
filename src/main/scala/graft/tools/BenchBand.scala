package graft.tools

/** Noise-vs-creep-vs-DRIFT classifier over the bench history (r11
  * verdict #5, box-drift normalization r12 verdict #1): single-run
  * ratios against last round cannot distinguish host noise from real
  * regressions, and per-query band tests cannot distinguish "this query
  * got slower" from "this BOX got slower" — a sustained container shift
  * moves every best-of wall together, which the r12 rule misread as 18
  * per-query CREEPs on untouched code (two rounds of manual worktree
  * A/Bs to clear). This tool reads the trailing per-query walls
  * (`bench_history_<sf>.tsv`, last 9 best-of runs, newest last) and the
  * current run's spread (`bench_diag.json` `[wall, …, wall_other]`) and
  * classifies in TWO passes:
  *
  *   1. **Suite drift factor** = median over all queries of
  *      `cur / median(trailing band)` — the robust "how much slower is
  *      this whole run than its own history" ratio. A uniform container
  *      shift lands entirely in this factor (median is immune to a
  *      handful of real regressions); snapped to 1.0 within ±3% so tiny
  *      wobble doesn't perturb otherwise-stable reports.
  *   2. **Per-query band test on drift-normalized walls**
  *      (`cur/factor`, `wall_other/factor`) against the trailing band:
  *      - band = [min, max] of the trailing walls EXCLUDING the newest;
  *      - breakout-up threshold = max(band) × 1.10 + 0.05 s (10% + a
  *        driver-floor allowance — sub-100 ms jitter is scheduling);
  *      - a RAW breakout that the normalization absorbs is **DRIFT** —
  *        the box moved, not the query;
  *      - a normalized breakout whose DISCARDED run is back inside the
  *        band is **NOISE** (one contended window, best-of caught it);
  *      - a normalized breakout where BOTH runs clear the threshold is
  *        **CREEP** — the plan or its data really got slower, even
  *        after discounting the box;
  *      - breakout-down prints as **IMPROVED** (or DRIFT when the whole
  *        suite moved down) so a fix's effect is visible.
  *
  * A box shift is rarely perfectly uniform (the r12 one hit sustained-
  * cpu kernels 1.5-2x while the suite median moved 7%), so flags CAN
  * survive normalization without being code regressions. Surviving
  * CREEP flags are auto-adjudicated by `tools/bench_ab.sh
  * <prev-close-sha>`: it parses this tool's CREEP lines, BenchProbes
  * the flagged queries at BOTH SHAs on the same box (worktree, fresh
  * JVM, best-of-3), and prints a per-query CODE vs BOX verdict — the
  * one-command replacement for the manual A/Bs rounds 11-12 needed.
  *
  * Usage: runMain graft.tools.BenchBand [historyTsv] [diagJson]
  * (no Spark session — pure file read, prints one line per breakout
  * plus a summary; exit code 0 always: the report informs, the judge
  * decides).
  */
/** Quiet-box pre-flight gate (r13 verdict #1): the committed
  * bench_history rows are every FUTURE round's band denominator, and
  * both r13 closing runs were captured on a visibly throttled container
  * — the inflation then haunts the band for nine rounds. So before the
  * timed pass, [[graft.Bench]] runs this canary (a dozen cheap queries
  * spanning scan / shuffle / window / join / store-read / sustained-cpu
  * profiles — including the exact kernels the r12/r13 throttles hit
  * hardest: bigram_lift, text_lm_backoff, m13_json_parse,
  * o5_event_windows), computes the same drift factor BenchBand uses
  * (median wall / trailing-median ratio), and REFUSES to start the
  * timed pass while the factor exceeds [[FactorThreshold]] — sleeping
  * with linear backoff and re-probing, up to [[MaxAttempts]]. A box
  * that never quiets down still produces an artifact (the driver's
  * time budget is finite), but one that carries its own flag:
  * `preflight_quiet=false` plus every observed factor, and BenchBand
  * prints the verdict as its header line. */
object QuietBox {

  /** Profile-diverse, individually sub-second canaries (~8 s total at
    * sf0.1). Missing names (renamed queries, other SFs) are skipped;
    * the factor needs [[MinComparable]] of them with history. */
  val CanaryQueries: Seq[String] = Seq(
    "q1_agg",                // parquet scan + group-agg
    "dedup_exact",           // hash groupBy (shuffle, tiny)
    "bm25_search_stored",    // sealed-store read path
    "text_repetition_ngrams",// sustained per-row cpu
    "o5_event_windows",      // window over event time (r13 throttle witness)
    "j8_salted_skew_join",   // shuffle join with salting
    "m13_json_parse",        // driver+executor parse cpu (r12 flag)
    "bigram_lift",           // wide agg + exact-integer math (r12 flag)
    "dedup_simhash",         // hashing cpu
    "text_lm_backoff",       // sustained cpu (r13 residual flag)
    "j2_equi_lookup",        // broadcast equi-join
    "shuffle_order")         // pure exchange

  val FactorThreshold = 1.15
  val MaxAttempts = 5
  val MinComparable = 5

  /** Canary drift factor: median over canaries of wall / trailing-band
    * median — the BenchBand drift statistic restricted to the canary
    * set. 1.0 when fewer than [[MinComparable]] canaries have ≥ 3
    * history walls (a fresh SF can't be judged, so it proceeds). */
  def factor(walls: Map[String, Double],
      history: Map[String, Seq[Double]]): Double = {
    val ratios = walls.toSeq.flatMap { case (n, w) =>
      history.get(n).filter(_.size >= 3).map(h => w / BenchBand.median(h))
    }
    if (ratios.size < MinComparable) 1.0 else BenchBand.median(ratios)
  }

  sealed trait Decision
  /** Sleep `sleepSec`, then re-probe. */
  final case class Retry(sleepSec: Int) extends Decision
  /** Start the timed pass; `quiet` = the last factor cleared the gate. */
  final case class Proceed(quiet: Boolean) extends Decision

  /** The retry decision over the factors observed so far (oldest
    * first): proceed as soon as a probe clears the threshold; linear
    * backoff between probes; after [[MaxAttempts]] probes proceed
    * LOUDLY un-quiet rather than blocking the driver's budget. */
  def decide(factorsSoFar: Seq[Double]): Decision = {
    require(factorsSoFar.nonEmpty, "decide needs at least one probe")
    if (factorsSoFar.last <= FactorThreshold) Proceed(quiet = true)
    else if (factorsSoFar.size >= MaxAttempts) Proceed(quiet = false)
    else Retry(sleepSec = 30 * factorsSoFar.size)
  }

  /** `"preflight":{...}` JSON fragment for bench_diag.json. */
  def json(factors: Seq[Double], quiet: Boolean): String = {
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    s""""preflight":{"factors":[${factors.map(f3).mkString(",")}],""" +
      s""""attempts":${factors.size},"final":${f3(factors.last)},""" +
      s""""threshold":$FactorThreshold,"quiet":$quiet}"""
  }

  /** Parse the preflight fragment back out of bench_diag.json (absent
    * on pre-r14 artifacts). */
  def parse(diag: String): Option[(Seq[Double], Int, Double, Boolean)] =
    ("\"preflight\":\\{\"factors\":\\[([^\\]]*)\\],\"attempts\":(\\d+)," +
      "\"final\":([0-9.]+),\"threshold\":[0-9.]+,\"quiet\":(true|false)\\}").r
      .findFirstMatchIn(diag).map { m =>
        (m.group(1).split(",").toSeq.flatMap(_.trim.toDoubleOption),
          m.group(2).toInt, m.group(3).toDouble, m.group(4).toBoolean)
      }

  /** BenchBand header line for a diag artifact. */
  def headerLine(diag: String): String = parse(diag) match {
    case Some((_, attempts, fin, quiet)) =>
      val verdict = if (quiet) "quiet box" else "NEVER QUIET — walls suspect"
      f"BAND PREFLIGHT factor=$fin%.3f attempts=$attempts " +
        f"threshold=$FactorThreshold ($verdict; gate: timed pass starts only at factor<=$FactorThreshold or after $MaxAttempts probes)"
    case None =>
      "BAND PREFLIGHT none recorded (pre-r14 artifact — closing walls were not quiet-box gated)"
  }
}

/** Task-cpu/GC plausibility band (r14 verdict "what's missing #2"): the
  * r13 COMMITTED close recorded 259 task-cpu-s / 1.3 s GC where every
  * adjacent run of near-identical code read 675–945 cpu-s / 8–17 s GC.
  * Post-hoc forensics (r15 NOTES): per-query walls in that artifact sum
  * identically to the r14 close over the shared queries AND sit at the
  * full-parallel compute floor (cpu_adjacent/32 threads), input-bytes
  * match adjacent runs, yet the two TIME columns deflate ×0.02–×0.8,
  * interleaved across the alphabetical run order and concentrated on
  * single-wave scan→agg faces — the work demonstrably executed at full
  * speed and only the per-task TIME meters under-read (under-ticked
  * virtualized cputime accounting of short parallel bursts; NOT dropped
  * listener events — bytes ride the same TaskEnd — and NOT cached
  * recomputation — bytes were re-read and walls are AT the floor, not
  * below it). Wall-side history is protected by [[QuietBox]]; this is
  * the same trailing-median machinery pointed at the cpu column, so a
  * meter failure ships visibly flagged instead of entering
  * `tools/bench_ab.sh`'s task-cpu adjudication unmarked.
  *
  * Suite cpu factor = median over queries of `cur_cpu / trailing-median
  * cpu`, restricted to queries whose trailing median is ≥
  * [[MinMedianCpu]] (sub-half-second meters are scheduling noise).
  * Flagged suspect OUTSIDE [[LowThreshold]], [[HighThreshold]]: normal
  * adjacent-run ratios read 0.8–1.25, throttle-window cpu inflation
  * reaches ~1.45 (r14 A-B-A brackets), the r13 failure read ~0.32. */
object CpuBand {
  val MinMedianCpu = 0.5
  val MinComparable = 10
  val LowThreshold = 0.55
  val HighThreshold = 1.8
  /** GC totals are far spikier than cpu (young-gen timing is bimodal);
    * only an order-of-magnitude break flags. */
  val GcLow = 0.2
  val GcHigh = 5.0

  /** Reserved pseudo-row in the cpu history TSV carrying the run-total
    * GC milliseconds (per-query GC is mostly zero — only the total has
    * a stable band). */
  val GcTotalRow = "__gc_total_ms"

  def factor(cur: Map[String, Double],
      hist: Map[String, Seq[Double]]): Option[Double] = {
    val ratios = cur.toSeq.flatMap { case (n, c) =>
      if (n == GcTotalRow) None
      else hist.get(n).filter(_.size >= 3).map(BenchBand.median)
        .filter(_ >= MinMedianCpu).map(m => c / m)
    }
    if (ratios.size < MinComparable) None else Some(BenchBand.median(ratios))
  }

  def gcFactor(curGcMs: Double, hist: Map[String, Seq[Double]]): Option[Double] =
    hist.get(GcTotalRow).filter(_.size >= 3).map(BenchBand.median)
      .filter(_ > 1e-9).map(curGcMs / _)

  def suspect(cpuF: Option[Double], gcF: Option[Double]): Boolean =
    cpuF.exists(v => v < LowThreshold || v > HighThreshold) ||
      gcF.exists(v => v < GcLow || v > GcHigh)

  /** `"cpu_band":{...}` JSON fragment for the bench artifacts. */
  def json(cpuF: Option[Double], gcF: Option[Double]): String = {
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def opt(o: Option[Double]) = o.map(f3).getOrElse("null")
    s""""cpu_factor":${opt(cpuF)},"gc_factor":${opt(gcF)},""" +
      s""""cpu_suspect":${suspect(cpuF, gcF)}"""
  }
}

object BenchBand {
  final case class Row(name: String, band: Seq[Double], cur: Double,
      other: Option[Double]) {
    def bandHi: Double = band.max
    def bandLo: Double = band.min
    def bandMedian: Double = median(band)
    def upThreshold: Double = bandHi * 1.10 + 0.05
    def downThreshold: Double = bandLo * 0.90 - 0.05
    /** Classification after dividing this run's walls by the suite
      * drift factor (1.0 = no normalization). */
    def classify(factor: Double): String = {
      val nCur = cur / factor
      val nOther = other.map(_ / factor)
      val rawUp = cur > upThreshold
      val rawDown = cur < downThreshold
      if (nCur > upThreshold) {
        nOther match {
          case Some(o) if o <= upThreshold =>
            "NOISE (best run broke out, discarded run in band)"
          case Some(_) => "CREEP (both runs above band after drift normalization)"
          case None    => "BREAKOUT (no spread recorded)"
        }
      } else if (rawUp)
        f"DRIFT (suite-wide box shift x$factor%.3f absorbs it)"
      else if (nCur < downThreshold) "IMPROVED"
      else if (rawDown)
        f"DRIFT (suite-wide box shift x$factor%.3f absorbs it)"
      else "in band"
    }
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) 0.0
    else if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Suite drift factor: median per-query ratio of the newest wall to
    * its own trailing-band median. Robust to a minority of genuine
    * regressions; snapped to 1.0 within ±3%. Degenerate suites (< 10
    * comparable queries) never normalize. */
  def driftFactor(rs: Seq[Row]): Double = {
    val ratios = rs.collect {
      case r if r.bandMedian > 1e-9 => r.cur / r.bandMedian
    }
    if (ratios.size < 10) 1.0
    else {
      val f = median(ratios)
      if (math.abs(f - 1.0) <= 0.03 || f <= 0.0) 1.0 else f
    }
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

  /** The full report as lines (pure — spec-testable without stdout). */
  def report(rs: Seq[Row]): Seq[String] = {
    val factor = driftFactor(rs)
    val out = rs.map(r => (r, r.classify(factor))).filterNot(_._2 == "in band")
      .sortBy { case (r, _) => -(r.cur / math.max(r.bandHi, 1e-9)) }
    val lines = out.map { case (r, cls) =>
      val o = r.other.map(v => f"$v%.2f").getOrElse("-")
      f"BAND ${r.name}%-32s cur=${r.cur}%.2f other=$o%-6s " +
        f"band=[${r.bandLo}%.2f,${r.bandHi}%.2f] n=${r.band.size} -> $cls"
    }
    val creep = out.count(_._2.startsWith("CREEP"))
    val noise = out.count(_._2.startsWith("NOISE"))
    val drift = out.count(_._2.startsWith("DRIFT"))
    val imp = out.count(_._2 == "IMPROVED")
    val probeHint =
      if (creep > 0)
        Seq("BAND PROBE auto-adjudicate surviving CREEP flags: " +
          "tools/bench_ab.sh <prev-close-sha> — BenchProbes them at both " +
          "SHAs on this box and prints CODE vs BOX per query")
      else Seq.empty
    lines ++ Seq(
      f"BAND DRIFT factor=$factor%.3f (suite-median cur/bandMedian; 1.000 = no box shift)",
      s"BAND SUMMARY queries=${rs.size} breakouts=${out.size} " +
        s"creep=$creep noise=$noise drift=$drift improved=$imp " +
        s"(thresholds on drift-normalized walls: up = bandMax*1.10+0.05s " +
        s"over trailing ${rs.headOption.map(_.band.size).getOrElse(0)}-run band, " +
        s"down = bandMin*0.90-0.05s)") ++ probeHint
  }

  def main(args: Array[String]): Unit = {
    val histPath = if (args.length > 0) args(0) else "bench_history_sf0.1.tsv"
    val diagPath = if (args.length > 1) args(1) else "bench_diag.json"
    val history = parseHistory(
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(
          java.nio.file.Paths.get(histPath))).asScala.toSeq)
    val diag =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(diagPath)))
        java.nio.file.Files.readString(java.nio.file.Paths.get(diagPath))
      else ""
    val spread = if (diag.nonEmpty) parseSpread(diag) else Map.empty[String, Double]
    // header: was the run captured behind the quiet-box gate?
    println(QuietBox.headerLine(diag))
    report(rows(history, spread)).foreach(println)
  }
}
