package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.JpegFixture
import graft.JpegFixture.ProgScan

/** Per-scan-type isolation of the progressive (SOF2) decode paths:
  * each script exercises ONE scan mechanism (DC/AC first, DC/AC
  * refinement, split bands, EOB runs across blocks, cropped edge MCUs)
  * against the sequential decode of the same image, which must match
  * bit-for-bit (a complete script reconstructs the exact quantized
  * coefficients). The TIFF-level composition lives in JpegTiffSpec;
  * this spec pins WHICH scan decoder broke when one does. */
class ProgressiveScanSpec extends AnyFunSuite {

  private val ones = Array.fill(64)(1)

  private def cmp(w: Int, h: Int, seed: Int, script: Seq[ProgScan],
      label: String): Unit = {
    val rng = new scala.util.Random(seed)
    val px = Array.fill(w * h)(rng.nextInt(256).toByte)
    val seqS = JpegFixture.scanStream(px, w, h, ones, withTables = true)
    val (p1, a) = JpegDecoder.decodeRaster(None, seqS, w, h, littleEndian = true)
    val prgS = JpegFixture.progressiveStream((x, y) => px(y * w + x) & 0xff,
      w, h, ones, prec = 8, withTables = true, script = script)
    val (p2, b) = JpegDecoder.decodeRaster(None, prgS, w, h, littleEndian = true)
    assert(p1 == 8 && p2 == 8)
    val bad = (0 until w * h).filter(i => a(i) != b(i))
    assert(bad.isEmpty,
      s"$label w=$w h=$h seed=$seed: ${bad.size} mismatches, first at ${bad.take(5)
        .map(i => s"($i: seq=${a(i) & 0xff} prog=${b(i) & 0xff})").mkString(", ")}")
  }

  test("A: single full-band AC scan, no refinement, one block") {
    (0 until 30).foreach(s => cmp(8, 8, s, Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "A"))
  }
  test("B: single full-band AC scan, no refinement, many blocks") {
    (0 until 10).foreach(s => cmp(24, 16, s, Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "B"))
  }
  test("C: DC approx only (AC full)") {
    (0 until 10).foreach(s => cmp(16, 8, s,
      Seq(ProgScan(0, 0, 0, 1), ProgScan(1, 63, 0, 0), ProgScan(0, 0, 1, 0)), "C"))
  }
  test("D: AC approx one level, one block") {
    (0 until 30).foreach(s => cmp(8, 8, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 1), ProgScan(1, 63, 1, 0)), "D"))
  }
  test("E: AC approx one level, many blocks") {
    (0 until 10).foreach(s => cmp(24, 16, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 1), ProgScan(1, 63, 1, 0)), "E"))
  }
  test("F: split bands") {
    (0 until 10).foreach(s => cmp(16, 16, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 5, 0, 0), ProgScan(6, 63, 0, 0)), "F"))
  }
  test("G: full standard script, one block") {
    (0 until 30).foreach(s => cmp(8, 8, s, JpegFixture.StandardScript, "G"))
  }
  test("H: full standard script, many blocks") {
    (0 until 10).foreach(s => cmp(24, 16, s, JpegFixture.StandardScript, "H"))
  }
  test("I: odd sizes (cropped edge MCUs)") {
    (0 until 10).foreach(s => cmp(17, 15, s, JpegFixture.StandardScript, "I"))
  }
  test("J: odd sizes, no refinement") {
    (0 until 10).foreach(s => cmp(17, 15, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "J"))
  }
}
