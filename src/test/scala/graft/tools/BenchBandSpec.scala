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
    val byName = rows.map(r => r.name -> r.classify).toMap
    assert(byName("knn_like") == "in band")
    assert(byName("noisy_q").startsWith("NOISE"))
    assert(byName("creep_q").startsWith("CREEP"))
    assert(byName("fixed_q") == "IMPROVED")
  }

  test("spread parse reads the 9-slot r12 diag arrays and skips 8-slot r11 ones") {
    val diag = """{"legend":"...","queries":{""" +
      """"a":[0.5,1.0,10,0,12,3,80,0,0.55],""" +
      """"b":[0.5,1.0,10,0,12,3,80,0]}}"""
    val s = BenchBand.parseSpread(diag)
    assert(s == Map("a" -> 0.55))
  }
}
