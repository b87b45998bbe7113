package graft.tools

import org.scalatest.funsuite.AnyFunSuite

class BenchBandSpec extends AnyFunSuite {

  test("band classification: noise vs creep vs improvement vs in-band") {
    val history = Seq(
      // cur 1.00 inside [0.55, 0.97] * 1.10 + 0.05 = 1.117 -> in band
      "knn_like 0.62 0.55 0.97 1.00",
      // cur 2.50 above 0.70*1.10+0.05, other 0.71 back in band -> NOISE
      "noisy_q 0.65 0.70 0.62 2.50",
      // cur 2.60 above band, other 2.55 also above -> CREEP
      "creep_q 0.65 0.70 0.62 2.60",
      // cur 0.30 below 0.62*0.90-0.05 = 0.508 -> IMPROVED
      "fixed_q 0.65 0.70 0.62 0.30",
      // too little history (needs >= 3 band samples + current)
      "young_q 0.65 2.60").map(_.trim)
    val spread = Map("noisy_q" -> 0.71, "creep_q" -> 2.55)
    val rows = BenchBand.rows(BenchBand.parseHistory(history), spread)
    assert(rows.size == 4) // young_q dropped
    // 4 comparable queries < 10 -> the drift factor never engages
    assert(BenchBand.driftFactor(rows) == 1.0)
    val byName = rows.map(r => r.name -> r.classify(1.0)).toMap
    assert(byName("knn_like") == "in band")
    assert(byName("noisy_q").startsWith("NOISE"))
    assert(byName("creep_q").startsWith("CREEP"))
    assert(byName("fixed_q") == "IMPROVED")
  }

  test("suite-wide box drift reads DRIFT, real creep survives normalization (r12 verdict #1)") {
    // 11 queries whose newest wall is a uniform x1.3 of a stable ~1.0s
    // band (the container got slower), plus one query that ADDITIONALLY
    // doubled with both runs high (a real regression). The r12 rule
    // called all 12 CREEP; the drift-normalized rule must keep exactly
    // the one real creep and attribute the rest to the box.
    val drifted = (1 to 11).map(i => f"text_q$i%02d 0.98 1.00 1.02 1.30")
    val history = drifted :+ "real_creep 0.98 1.00 1.02 2.60"
    val spread = (1 to 11).map(i => f"text_q$i%02d" -> 1.32).toMap +
      ("real_creep" -> 2.55)
    val rows = BenchBand.rows(BenchBand.parseHistory(history), spread)
    val f = BenchBand.driftFactor(rows)
    assert(math.abs(f - 1.30) < 1e-9, s"factor $f")
    val byName = rows.map(r => r.name -> r.classify(f)).toMap
    (1 to 11).foreach { i =>
      assert(byName(f"text_q$i%02d").startsWith("DRIFT"), byName(f"text_q$i%02d"))
    }
    assert(byName("real_creep").startsWith("CREEP"), byName("real_creep"))
    val rep = BenchBand.report(rows)
    assert(rep.exists(_.contains("factor=1.300")), rep.mkString("\n"))
    assert(rep.exists(_.contains("creep=1 noise=0 drift=11")), rep.mkString("\n"))
    assert(rep.exists(_.startsWith("BAND PROBE")), "probe recipe printed for creep")
  }

  test("downward box drift: uniformly faster run is DRIFT, a real fix is IMPROVED") {
    val drifted = (1 to 11).map(i => f"scan_q$i%02d 0.98 1.00 1.02 0.70")
    val history = drifted :+ "real_fix 0.98 1.00 1.02 0.30"
    val rows = BenchBand.rows(BenchBand.parseHistory(history), Map.empty)
    val f = BenchBand.driftFactor(rows)
    assert(math.abs(f - 0.70) < 1e-9, s"factor $f")
    val byName = rows.map(r => r.name -> r.classify(f)).toMap
    (1 to 11).foreach { i =>
      assert(byName(f"scan_q$i%02d").startsWith("DRIFT"), byName(f"scan_q$i%02d"))
    }
    // 0.30/0.70 = 0.43 still under 1.00*0.90-0.05
    assert(byName("real_fix") == "IMPROVED", byName("real_fix"))
  }

  test("tiny suite wobble snaps the factor to 1.0 — reports stay byte-stable") {
    val history = (1 to 12).map(i => f"q$i%02d 0.98 1.00 1.02 1.02")
    val rows = BenchBand.rows(BenchBand.parseHistory(history), Map.empty)
    assert(BenchBand.driftFactor(rows) == 1.0)
    assert(rows.forall(_.classify(1.0) == "in band"))
  }

  test("spread parse reads the 9-slot r12 diag arrays and skips 8-slot r11 ones") {
    val diag = """{"legend":"...","queries":{""" +
      """"a":[0.5,1.0,10,0,12,3,80,0,0.55],""" +
      """"b":[0.5,1.0,10,0,12,3,80,0]}}"""
    val s = BenchBand.parseSpread(diag)
    assert(s == Map("a" -> 0.55))
  }

  test("quiet-box gate: throttled probes retry with backoff, a quiet one proceeds (r13 verdict #1)") {
    // throttled, throttled, quiet → two retries with growing sleeps,
    // then the timed pass starts with quiet=true
    assert(QuietBox.decide(Seq(1.40)) == QuietBox.Retry(30))
    assert(QuietBox.decide(Seq(1.40, 1.31)) == QuietBox.Retry(60))
    assert(QuietBox.decide(Seq(1.40, 1.31, 1.08)) == QuietBox.Proceed(quiet = true))
    // exactly at the threshold is quiet
    assert(QuietBox.decide(Seq(1.15)) == QuietBox.Proceed(quiet = true))
    // a box that never settles proceeds LOUDLY un-quiet at MaxAttempts
    val never = Seq(1.5, 1.5, 1.5, 1.5, 1.5)
    assert(never.size == QuietBox.MaxAttempts)
    assert(QuietBox.decide(never) == QuietBox.Proceed(quiet = false))
    assert(QuietBox.decide(never.dropRight(1)) == QuietBox.Retry(120))
  }

  test("quiet-box factor: canary median vs trailing history, 1.0 when unjudgeable") {
    val history = Map(
      "a" -> Seq(1.0, 1.0, 1.0), "b" -> Seq(0.5, 0.5, 0.5),
      "c" -> Seq(2.0, 2.0, 2.0), "d" -> Seq(1.0, 1.0, 1.0),
      "e" -> Seq(1.0, 1.0, 1.0), "short" -> Seq(1.0, 1.0))
    // uniform 1.3x throttle over five comparable canaries
    val walls = Map("a" -> 1.3, "b" -> 0.65, "c" -> 2.6, "d" -> 1.3, "e" -> 1.3)
    assert(math.abs(QuietBox.factor(walls, history) - 1.3) < 1e-9)
    // one outlier does not move the median
    assert(math.abs(QuietBox.factor(walls + ("c" -> 20.0), history) - 1.3) < 1e-9)
    // fewer than MinComparable comparable canaries → 1.0 (proceed):
    // "short" has only 2 history walls and f/g have none
    val thin = Map("a" -> 9.0, "b" -> 9.0, "short" -> 9.0, "f" -> 9.0, "g" -> 9.0)
    assert(QuietBox.factor(thin, history) == 1.0)
  }

  test("cpu-band flag: the r13 under-read meter signature flags, normal runs don't (r14 verdict #2)") {
    // trailing cpu medians ~ 6s for 12 meaningful queries + noise rows
    val hist = (1 to 12).map(i => f"cpu_q$i%02d" -> Seq(5.8, 6.0, 6.2)).toMap +
      ("tiny_q" -> Seq(0.02, 0.03, 0.02)) + // below MinMedianCpu: excluded
      (CpuBand.GcTotalRow -> Seq(9000.0, 12000.0, 15000.0))
    // the r13 failure shape: suite cpu at ~0.3x of band, GC at ~0.1x
    val bad = (1 to 12).map(i => f"cpu_q$i%02d" -> 1.9).toMap + ("tiny_q" -> 0.5)
    val fBad = CpuBand.factor(bad, hist)
    assert(fBad.exists(f => math.abs(f - 1.9 / 6.0) < 1e-9), fBad)
    val gBad = CpuBand.gcFactor(1300.0, hist)
    assert(gBad.exists(g => math.abs(g - 1300.0 / 12000.0) < 1e-9), gBad)
    assert(CpuBand.suspect(fBad, gBad))
    assert(CpuBand.suspect(fBad, None), "cpu factor alone must flag")
    assert(CpuBand.suspect(None, gBad), "gc factor alone must flag")
    // normal adjacent-run wobble (0.8-1.25) and even a throttle-window
    // cpu inflation (~1.45, r14 A-B-A brackets) must NOT flag
    for (r <- Seq(0.8, 1.0, 1.25, 1.45)) {
      val cur = (1 to 12).map(i => f"cpu_q$i%02d" -> 6.0 * r).toMap
      assert(!CpuBand.suspect(CpuBand.factor(cur, hist), CpuBand.gcFactor(12000.0 * r, hist)),
        s"ratio $r flagged")
    }
    // an over-reading meter (>1.8x) flags too
    val over = (1 to 12).map(i => f"cpu_q$i%02d" -> 12.0).toMap
    assert(CpuBand.suspect(CpuBand.factor(over, hist), None))
    // fewer than MinComparable meaningful queries -> no judgment
    val thinHist = Map("a" -> Seq(5.0, 5.0, 5.0))
    assert(CpuBand.factor(Map("a" -> 1.0), thinHist).isEmpty)
    assert(!CpuBand.suspect(CpuBand.factor(Map("a" -> 1.0), thinHist), None))
    // the GC pseudo-row never enters the cpu factor
    assert(CpuBand.factor(
      (1 to 9).map(i => f"cpu_q$i%02d" -> 6.0).toMap + (CpuBand.GcTotalRow -> 9000.0),
      hist).isEmpty, "9 queries + the pseudo-row must stay below MinComparable")
    // json fragment shape (artifact consumers parse it)
    assert(CpuBand.json(fBad, gBad) ==
      """"cpu_factor":0.317,"gc_factor":0.108,"cpu_suspect":true""")
    assert(CpuBand.json(None, None) ==
      """"cpu_factor":null,"gc_factor":null,"cpu_suspect":false""")
  }

  test("preflight json roundtrips through parse and prints the header verdict") {
    val j = "{" + QuietBox.json(Seq(1.402, 1.061), quiet = true) + "}"
    assert(QuietBox.parse(j).contains((Seq(1.402, 1.061), 2, 1.061, true)))
    assert(QuietBox.headerLine(j).contains("factor=1.061"))
    assert(QuietBox.headerLine(j).contains("quiet box"))
    val bad = "{" + QuietBox.json(Seq.fill(5)(1.5), quiet = false) + "}"
    assert(QuietBox.headerLine(bad).contains("NEVER QUIET"))
    // pre-r14 artifacts have no fragment
    assert(QuietBox.headerLine("""{"legend":"..."}""").contains("none recorded"))
    // canary names must exist in the registry (a rename would silently
    // shrink the canary below MinComparable)
    val names = graft.SparkEntry.queries.keySet
    QuietBox.CanaryQueries.foreach(n => assert(names.contains(n), n))
  }
}
