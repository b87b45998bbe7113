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
}
