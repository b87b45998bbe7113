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

  /** 12-bit twin of [[cmp]]: progressive 12-bit vs sequential SOF1
    * 12-bit of the same image, sample-exact (two bytes per sample). */
  private def cmp12(w: Int, h: Int, seed: Int, script: Seq[ProgScan],
      label: String, q: Array[Int] = null): Unit = {
    // q=64 bounds quantized AC magnitudes at 12-bit noise to ≤512
    // (category ≤ 10 — the sequential REFERENCE encoder carries the
    // Annex-K AC table, which stops there; the progressive side's flat
    // 256-symbol table has no such limit, and the DECODER under test
    // handles all categories on both paths)
    val qt = if (q == null) Array.fill(64)(64) else q
    val rng = new scala.util.Random(seed)
    val px = Array.fill(w * h)(rng.nextInt(4096))
    val seqS = JpegFixture.scanStream12(px, w, h, qt, withTables = true)
    val (p1, a) = JpegDecoder.decodeRaster(None, seqS, w, h, littleEndian = true)
    val prgS = JpegFixture.progressiveStream((x, y) => px(y * w + x),
      w, h, qt, prec = 12, withTables = true, script = script)
    val (p2, b) = JpegDecoder.decodeRaster(None, prgS, w, h, littleEndian = true)
    assert(p1 == 12 && p2 == 12)
    val bad = (0 until w * h * 2).count(i => a(i) != b(i))
    assert(bad == 0, s"$label-12bit w=$w h=$h seed=$seed: $bad byte mismatches")
  }

  test("A12/B12: 12-bit EOBn runs — full-band AC scans, one and many blocks") {
    // the EOB-run decoder is one of the two scan paths with
    // precision-dependent arithmetic (DC categories reach 15 at 12-bit,
    // receive-extend widths change) — isolate it at 12-bit explicitly
    (0 until 10).foreach(s => cmp12(8, 8, s, Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "A12"))
    (0 until 5).foreach(s => cmp12(24, 16, s, Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "B12"))
    // coarse quantizer → most blocks all-zero AC → long cross-block EOB
    // runs with multi-bit EOBRUN extension fields
    (0 until 5).foreach(s => cmp12(40, 24, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)), "B12-eobrun", Array.fill(64)(512)))
  }

  test("D12/E12: 12-bit correction-bit walk — AC refinement, one and many blocks") {
    // the G.1.2.3 refinement walk is the other precision-dependent scan
    // decoder: at 12-bit the refined magnitudes span the full 4096 range
    (0 until 10).foreach(s => cmp12(8, 8, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 1), ProgScan(1, 63, 1, 0)), "D12"))
    (0 until 5).foreach(s => cmp12(24, 16, s,
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 1), ProgScan(1, 63, 1, 0)), "E12"))
    // two refinement levels: correction bits land on already-nonzero
    // coefficients across two successive walks
    (0 until 5).foreach(s => cmp12(16, 16, s,
      Seq(ProgScan(0, 0, 0, 2), ProgScan(0, 0, 2, 1), ProgScan(0, 0, 1, 0),
        ProgScan(1, 63, 0, 2), ProgScan(1, 63, 2, 1), ProgScan(1, 63, 1, 0)), "E12-al2"))
  }

  test("G12: 12-bit full standard script, odd sizes") {
    (0 until 5).foreach(s => cmp12(17, 15, s, JpegFixture.StandardScript, "G12"))
  }

  test("L: randomized scan scripts — DC depth x band split x AC depth x interleave x restarts, 150 cases") {
    // every script is COMPLETE (all bands reach Al=0), so bit-equality
    // with the sequential decode must hold for ANY script shape — this
    // sweeps the script space the fixed suites cannot enumerate
    val rng = new scala.util.Random(0x50A72L)
    (0 until 150).foreach { i =>
      val w = 3 + rng.nextInt(40)
      val h = 3 + rng.nextInt(40)
      val px = Array.fill(w * h)(rng.nextInt(256).toByte)
      val qv = Seq(1, 4, 16)(rng.nextInt(3))
      val qt = Array.fill(64)(qv)
      val dcAl = rng.nextInt(3)
      val acAl = rng.nextInt(3)
      val split = 1 + rng.nextInt(62) // AC band boundary
      val dcScans = ProgScan(0, 0, 0, dcAl) +:
        (dcAl to 1 by -1).map(al => ProgScan(0, 0, al, al - 1))
      val acFirst = Seq(ProgScan(1, split, 0, acAl), ProgScan(split + 1, 63, 0, acAl))
      val acRef = (acAl to 1 by -1).map(al => ProgScan(1, 63, al, al - 1))
      val script = if (rng.nextBoolean()) dcScans ++ acFirst ++ acRef
                   else dcScans.take(1) ++ acFirst ++ dcScans.drop(1) ++ acRef
      val rst = Seq(0, 0, 2, 3)(rng.nextInt(4))
      val seqS = JpegFixture.scanStream(px, w, h, qt, withTables = true)
      val (p1, a) = JpegDecoder.decodeRaster(None, seqS, w, h, littleEndian = true)
      val prgS = JpegFixture.progressiveStream((x, y) => px(y * w + x) & 0xff,
        w, h, qt, prec = 8, withTables = true, script = script, restartInterval = rst)
      val (p2, b) = JpegDecoder.decodeRaster(None, prgS, w, h, littleEndian = true)
      assert(p1 == 8 && p2 == 8)
      val bad = (0 until w * h).count(j => a(j) != b(j))
      assert(bad == 0, s"case $i: $bad mismatches [w=$w h=$h q=$qv dcAl=$dcAl " +
        s"acAl=$acAl split=$split rst=$rst script=$script]")
    }
  }

  test("M: INCOMPLETE scripts fail loudly — never a silent approximation") {
    // r13 advisor: every per-scan chain can validate while the SCRIPT
    // as a whole stops short (a band never scanned, or parked above
    // Al=0) — that is a progressive preview, not a full decode.
    def decodeScript(script: Seq[ProgScan]): Unit = {
      val stream = JpegFixture.progressiveStream((x, y) => (x * 7 + y * 13) % 256,
        16, 8, ones, prec = 8, withTables = true, script = script)
      JpegDecoder.decodeRaster(None, stream, 16, 8, littleEndian = true)
    }
    // AC band never scanned at all (DC-only script)
    val e1 = intercept[JpegDecoder.JpegError](decodeScript(Seq(ProgScan(0, 0, 0, 0))))
    assert(e1.getMessage.contains("never scanned"), e1.getMessage)
    // a band gap: 1..5 scanned, 6..63 never
    val e2 = intercept[JpegDecoder.JpegError](decodeScript(
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 5, 0, 0))))
    assert(e2.getMessage.contains("never scanned"), e2.getMessage)
    // AC chain parked above Al=0 (first scan at Al=1, refinement missing)
    val e3 = intercept[JpegDecoder.JpegError](decodeScript(
      Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 1))))
    assert(e3.getMessage.contains("stops at Al=1"), e3.getMessage)
    // DC chain parked above Al=0
    val e4 = intercept[JpegDecoder.JpegError](decodeScript(
      Seq(ProgScan(0, 0, 0, 2), ProgScan(0, 0, 2, 1), ProgScan(1, 63, 0, 0))))
    assert(e4.getMessage.contains("stops at Al=1"), e4.getMessage)
    // and the complete twin of each shape decodes fine
    decodeScript(Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 5, 0, 0), ProgScan(6, 63, 0, 0)))
    decodeScript(Seq(ProgScan(0, 0, 0, 1), ProgScan(0, 0, 1, 0),
      ProgScan(1, 63, 0, 1), ProgScan(1, 63, 1, 0)))
  }

  test("N: a stream that ends without EOI fails as truncated, not as complete") {
    // r13 advisor: parseSegments used to return the same -1 for EOI and
    // for plain data exhaustion, so a cut-off file decoded as complete.
    val rng = new scala.util.Random(7)
    val px = Array.fill(16 * 8)(rng.nextInt(256).toByte)
    val full = JpegFixture.scanStream(px, 16, 8, ones, withTables = true)
    assert((full(full.length - 2) & 0xff) == 0xff && (full.last & 0xff) == 0xd9)
    val cut = full.dropRight(2) // remove the EOI marker only
    val e = intercept[JpegDecoder.JpegError](
      JpegDecoder.decodeRaster(None, cut, 16, 8, littleEndian = true))
    assert(e.getMessage.contains("without an EOI"), e.getMessage)
    // progressive twin: EOI removed after the last scan
    val prg = JpegFixture.progressiveStream((x, y) => px(y * 16 + x) & 0xff,
      16, 8, ones, prec = 8, withTables = true,
      script = Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)))
    val e2 = intercept[JpegDecoder.JpegError](
      JpegDecoder.decodeRaster(None, prg.dropRight(2), 16, 8, littleEndian = true))
    assert(e2.getMessage.contains("without an EOI"), e2.getMessage)
  }

  test("L12: randomized 12-bit scan scripts — the L sweep at full precision, 60 cases") {
    // the fixed 12-bit suites (A12-G12) isolate mechanisms; this sweeps
    // the script space at 12-bit the way L does at 8-bit (q=64 keeps
    // the sequential reference encoder inside its Annex-K AC table)
    val rng = new scala.util.Random(0x50A84L)
    (0 until 60).foreach { i =>
      val w = 3 + rng.nextInt(30)
      val h = 3 + rng.nextInt(30)
      val px = Array.fill(w * h)(rng.nextInt(4096))
      val qt = Array.fill(64)(Seq(64, 128, 512)(rng.nextInt(3)))
      val dcAl = rng.nextInt(3)
      val acAl = rng.nextInt(3)
      val split = 1 + rng.nextInt(62)
      val dcScans = ProgScan(0, 0, 0, dcAl) +:
        (dcAl to 1 by -1).map(al => ProgScan(0, 0, al, al - 1))
      val acFirst = Seq(ProgScan(1, split, 0, acAl), ProgScan(split + 1, 63, 0, acAl))
      val acRef = (acAl to 1 by -1).map(al => ProgScan(1, 63, al, al - 1))
      val script = if (rng.nextBoolean()) dcScans ++ acFirst ++ acRef
                   else dcScans.take(1) ++ acFirst ++ dcScans.drop(1) ++ acRef
      val rst = Seq(0, 0, 2, 3)(rng.nextInt(4))
      val seqS = JpegFixture.scanStream12(px, w, h, qt, withTables = true)
      val (p1, a) = JpegDecoder.decodeRaster(None, seqS, w, h, littleEndian = true)
      val prgS = JpegFixture.progressiveStream((x, y) => px(y * w + x),
        w, h, qt, prec = 12, withTables = true, script = script, restartInterval = rst)
      val (p2, b) = JpegDecoder.decodeRaster(None, prgS, w, h, littleEndian = true)
      assert(p1 == 12 && p2 == 12)
      val bad = (0 until w * h * 2).count(j => a(j) != b(j))
      assert(bad == 0, s"case $i: $bad byte mismatches [w=$w h=$h q=${qt(0)} " +
        s"dcAl=$dcAl acAl=$acAl split=$split rst=$rst script=$script]")
    }
  }

  /** Entropy bytes of each scan: the data after each SOS header up to
    * the next marker (no 0xFF bytes occur in these tiny streams). */
  private def scanEntropyBytes(stream: Array[Byte]): Seq[Seq[Int]] = {
    val out = Seq.newBuilder[Seq[Int]]
    var i = 0
    while (i + 1 < stream.length) {
      if ((stream(i) & 0xff) == 0xff && (stream(i + 1) & 0xff) == 0xda) {
        val len = ((stream(i + 2) & 0xff) << 8) | (stream(i + 3) & 0xff)
        var j = i + 2 + len
        val seg = Seq.newBuilder[Int]
        while (j < stream.length && (stream(j) & 0xff) != 0xff) {
          seg += (stream(j) & 0xff); j += 1
        }
        out += seg.result()
        i = j
      } else i += 1
    }
    out.result()
  }

  test("K: hand-computed bitstream pins the T.81 conventions (no mutual encoder/decoder misreading)") {
    // The roundtrip cross-equality can't catch a bug the encoder and
    // decoder share (e.g. both counting an EOB run off by one) — so pin
    // the exact T.81 bytes of a case small enough to derive by hand.
    // 16×8 all-128 pixels, q = ones: level shift makes every
    // coefficient 0 in both blocks.
    //
    // Scan 1 (DC first, Ah=Al=0): two zero diffs → Annex-K DC category
    //   0 code '00' twice = bits 0000 + 1-padding = 0x0F.
    // Scan 2 (AC first, band 1..63): both blocks all-zero → ONE EOBn
    //   covering both: EOBRUN = 2 → nbits = 1 → symbol 0x10 (flat AC
    //   table: symbols 0..254 at length 9, symbol 16 = code 000010000)
    //   + 1 extension bit (2 & 1 = 0) → bits 0000100000 + 1-padding =
    //   0x08 0x3F.
    val stream = JpegFixture.progressiveStream((_, _) => 128, 16, 8, ones,
      prec = 8, withTables = true,
      script = Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)))
    val scans = scanEntropyBytes(stream)
    assert(scans.length == 2, scans)
    assert(scans(0) == Seq(0x0f), s"DC scan bytes: ${scans(0).map(b => f"$b%02x")}")
    assert(scans(1) == Seq(0x08, 0x3f), s"AC scan bytes: ${scans(1).map(b => f"$b%02x")}")
    // and the decoder consumes exactly those conventions back to flat 128s
    val (p, px) = JpegDecoder.decodeRaster(None, stream, 16, 8, littleEndian = true)
    assert(p == 8 && px.forall(b => (b & 0xff) == 128))
    // EOB-run extension bits: 24×8 (3 blocks, all zero) → EOBRUN = 3 →
    // nbits = 1, symbol 0x10, ext bit 1 → bits 0000100001 + padding =
    // 0x08 0x7F
    val s3 = JpegFixture.progressiveStream((_, _) => 128, 24, 8, ones,
      prec = 8, withTables = true,
      script = Seq(ProgScan(0, 0, 0, 0), ProgScan(1, 63, 0, 0)))
    val scans3 = scanEntropyBytes(s3)
    assert(scans3(1) == Seq(0x08, 0x7f), s"3-block EOB run: ${scans3(1).map(b => f"$b%02x")}")
  }
}
