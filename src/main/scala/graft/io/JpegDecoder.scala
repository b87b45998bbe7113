package graft.io

/** Minimal JPEG decoder for TIFF compression 7 — the last common
  * wild-file codec the GRD ingest path lacked (the reference opens
  * GRDs through rasterio/libtiff, which accepts any registered codec:
  * `/root/reference/icecube/bin/sar_cube/grd_datacube.py:117-149`).
  * Scope matches the reader's raster contract (single-band SAR
  * quicklooks/overviews): Huffman DCT — baseline SOF0 (8-bit),
  * extended-sequential SOF1 (8- and 12-bit; 16-bit DQT entries per
  * T.81 B.2.4.1), and progressive SOF2 (8- and 12-bit: spectral
  * selection + successive approximation per T.81 G.2 — DC first/refine
  * scans, AC first scans with EOB runs, AC refinement with correction
  * bits; every coefficient's scan chain is validated, so a refinement
  * before its first scan or a skipped approximation step fails loudly
  * instead of reconstructing garbage) — one component, restart
  * markers, and libtiff's split-tables convention (tag 347
  * `JPEGTables` carries a tables-only stream; each strip/tile is an
  * abbreviated SOI..EOI scan run that inherits them). 12-bit samples
  * decode to 16-bit storage words ([[decodeRaster]]; the TIFF layer
  * reads BitsPerSample=12 rasters as uint16). Everything outside that
  * scope fails LOUDLY — arithmetic coding, lossless SOF3, 16-bit
  * samples, multi-component color — never a silent wrong answer.
  *
  * Algorithm notes: entropy decode per ITU T.81 §F.2 (EXTEND sign
  * reconstruction, DC prediction per component, 0xFF00 byte
  * unstuffing); progressive scans per §G.2 (EOBn run decode, the
  * §G.1.2.3 correction-bit walk for AC refinement, arithmetic-shift
  * point transform for DC so successive approximation reconstructs
  * negative predictors exactly); all scans accumulate QUANTIZED
  * coefficients, then one dequant + double-precision 2-D inverse DCT
  * per §A.3.3 with the separable 8-point kernel; +half level shift;
  * clamp to [0, 2^P−1]. A sequential frame is the degenerate single
  * full-band scan of the same path, so baseline and progressive
  * encodings of the same quantized coefficients decode bit-identically
  * (JpegTiffSpec pins that cross-equality). Accuracy beats speed here
  * — one IDCT per 8×8 block is not the hot path (decode parallelism
  * comes from Spark's per-strip `flatMap`, like every other TIFF codec
  * in `io/Tiff.scala`).
  */
object JpegDecoder {

  final class JpegError(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new JpegError(s"JPEG: $msg")

  /** One Huffman table: code lengths 1..16 → symbols, decoded via the
    * canonical (mincode/maxcode/valptr) walk of T.81 §F.2.2.3. */
  private final class Huff(counts: Array[Int], symbols: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = code - 1
        if (counts(l - 1) == 0) maxCode(l) = -1
        code <<= 1
        l += 1
      }
    }
    def symbol(ptr: Int): Int = {
      // a corrupt stream can walk code past the populated range even when
      // code <= maxCode(l) lies (counts/symbols mismatch in the DHT) —
      // keep the failure on the typed JpegError path, not AIOOBE
      if (ptr < 0 || ptr >= symbols.length)
        fail(s"Huffman symbol index $ptr outside the ${symbols.length}-entry table — corrupt stream")
      symbols(ptr) & 0xff
    }
  }

  /** Entropy-coded-segment bit reader: unstuffs 0xFF00, stops at any
    * other marker (leaving position on the 0xFF). */
  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var bits = 0
    private var nBits = 0
    def align(): Unit = { bits = 0; nBits = 0 }
    def bit(): Int = {
      if (nBits == 0) {
        if (pos >= d.length) fail("entropy stream truncated")
        val b = d(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= d.length) fail("entropy stream truncated at 0xFF")
          val m = d(pos) & 0xff
          if (m == 0) pos += 1 // stuffed byte
          else fail(f"marker 0xFF$m%02X inside an entropy run — the scan data ran short (corrupt stream)")
        }
        bits = b
        nBits = 8
      }
      nBits -= 1
      (bits >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (code > h.maxCode(l)) {
        if (l >= 16) fail("Huffman code longer than 16 bits — corrupt stream")
        code = (code << 1) | bit()
        l += 1
      }
      h.symbol(h.valPtr(l) + code - h.minCode(l))
    }
  }

  /** T.81 F.2.1.2 EXTEND: map a `receive`d magnitude to its signed
    * coefficient. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** cos((2x+1)·u·π/16)·C(u)/2 — the separable 8-point IDCT kernel. */
  private val Kernel: Array[Double] = {
    val k = new Array[Double](64)
    var u = 0
    while (u < 8) {
      val cu = if (u == 0) math.sqrt(0.5) else 1.0
      var x = 0
      while (x < 8) {
        k(u * 8 + x) = cu / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
        x += 1
      }
      u += 1
    }
    k
  }

  /** Mutable decoder state accumulated across the tables stream and
    * the scan stream (libtiff splits them between tag 347 and the
    * strip). */
  private final class State {
    val quant = new Array[Array[Int]](4)
    val quant16 = new Array[Boolean](4) // Pq=1 entries (12-bit streams only)
    val dcHuff = new Array[Huff](4)
    val acHuff = new Array[Huff](4)
    var width = 0
    var height = 0
    var precision = 8
    var progressive = false
    var restartInterval = 0
    var dcTableId = 0
    var acTableId = 0
    var quantId = 0
    var sofSeen = false
    // current scan's spectral band + successive approximation (SOS)
    var ss = 0
    var se = 63
    var ah = 0
    var al = 0
  }

  private def u16(d: Array[Byte], p: Int): Int =
    ((d(p) & 0xff) << 8) | (d(p + 1) & 0xff)

  /** Walk markers from `pos` until SOS (returns the entropy-data start)
    * or EOI/end (returns -1). Populates `st`. */
  private def parseSegments(d: Array[Byte], start: Int, st: State): Int = {
    var pos = start
    if (pos + 1 < d.length && (d(pos) & 0xff) == 0xff && (d(pos + 1) & 0xff) == 0xd8)
      pos += 2 // SOI
    while (pos + 1 < d.length) {
      if ((d(pos) & 0xff) != 0xff) fail(f"expected marker, got 0x${d(pos) & 0xff}%02X at $pos")
      while (pos + 1 < d.length && (d(pos + 1) & 0xff) == 0xff) pos += 1 // fill bytes (T.81 B.1.1.2)
      val m = d(pos + 1) & 0xff
      pos += 2
      m match {
        case 0xd9 => return -1 // EOI (tables-only stream, or end of the scan run)
        case 0xd8 => ()        // stray SOI
        case 0xdb =>           // DQT (Pq=0 8-bit entries; Pq=1 16-bit,
                               // legal only with 12-bit samples — checked
                               // against the frame precision at scan time)
          val len = u16(d, pos)
          var p = pos + 2
          while (p < pos + len) {
            val pq = (d(p) & 0xff) >> 4
            val tq = d(p) & 0x0f
            if (pq != 0 && pq != 1) fail(s"DQT element precision $pq (0 or 1 only)")
            val q = new Array[Int](64)
            var i = 0
            if (pq == 0) {
              while (i < 64) { q(ZigZag(i)) = d(p + 1 + i) & 0xff; i += 1 }
              p += 65
            } else {
              while (i < 64) { q(ZigZag(i)) = u16(d, p + 1 + 2 * i); i += 1 }
              p += 129
            }
            st.quant(tq) = q
            st.quant16(tq) = pq == 1
          }
          pos += len
        case 0xc4 =>           // DHT (progressive streams redefine between scans)
          val len = u16(d, pos)
          var p = pos + 2
          while (p < pos + len) {
            val tc = (d(p) & 0xff) >> 4
            val th = d(p) & 0x0f
            val counts = Array.tabulate(16)(i => d(p + 1 + i) & 0xff)
            val n = counts.sum
            val symbols = java.util.Arrays.copyOfRange(d, p + 17, p + 17 + n)
            if (tc == 0) st.dcHuff(th) = new Huff(counts, symbols)
            else st.acHuff(th) = new Huff(counts, symbols)
            p += 17 + n
          }
          pos += len
        case sof @ (0xc0 | 0xc1 | 0xc2) => // SOF0 baseline / SOF1 extended / SOF2 progressive
          if (st.sofSeen) fail("second SOF frame header in one stream")
          val len = u16(d, pos)
          val precision = d(pos + 2) & 0xff
          if (sof == 0xc0 && precision != 8)
            fail(s"$precision-bit samples in a baseline SOF0 frame (T.81 allows 8 only)")
          if (precision != 8 && precision != 12)
            fail(s"$precision-bit samples not supported (8- and 12-bit Huffman DCT only)")
          st.precision = precision
          st.progressive = sof == 0xc2
          st.height = u16(d, pos + 3)
          st.width = u16(d, pos + 5)
          val nComp = d(pos + 7) & 0xff
          if (nComp != 1)
            fail(s"$nComp-component JPEG not supported (single-band grayscale rasters only)")
          val sampling = d(pos + 9) & 0xff
          if (sampling != 0x11) fail(f"subsampling 0x$sampling%02X on a 1-component scan")
          st.quantId = d(pos + 10) & 0xff
          st.sofSeen = true
          pos += len
        case sof if sof >= 0xc3 && sof <= 0xcf && sof != 0xc8 && sof != 0xcc =>
          fail(f"SOF 0x$sof%02X not supported (Huffman sequential/progressive DCT only)")
        case 0xcc => fail("arithmetic coding not supported (Huffman only)")
        case 0xdd =>           // DRI
          st.restartInterval = u16(d, pos + 2)
          pos += u16(d, pos)
        case 0xda =>           // SOS (ns=1: Cs, Td/Ta, then Ss, Se, Ah/Al)
          val len = u16(d, pos)
          val ns = d(pos + 2) & 0xff
          if (ns != 1) fail(s"$ns-component scan not supported")
          st.dcTableId = (d(pos + 4) & 0xff) >> 4
          st.acTableId = d(pos + 4) & 0x0f
          st.ss = d(pos + 5) & 0xff
          st.se = d(pos + 6) & 0xff
          st.ah = (d(pos + 7) & 0xff) >> 4
          st.al = d(pos + 7) & 0x0f
          return pos + len
        case app if app >= 0xe0 && app <= 0xef => pos += u16(d, pos) // APPn
        case 0xfe => pos += u16(d, pos)                              // COM
        case other => fail(f"unsupported marker 0xFF$other%02X")
      }
    }
    // only EOI returns -1 (above); running out of bytes here means the
    // stream was truncated — a decoder that treated exhaustion as EOI
    // would silently decode a cut-off file as complete
    fail(s"stream ended at $pos without an EOI marker (truncated)")
  }

  /** Decode a tables-only stream (TIFF tag 347) into fresh state. */
  private def tablesState(tables: Option[Array[Byte]]): State = {
    val st = new State
    tables.foreach { t =>
      val sos = parseSegments(t, 0, st)
      if (sos >= 0) fail("JPEGTables stream contains a scan (expected tables only)")
    }
    st
  }

  /** Decode one abbreviated-or-full 8-BIT stream into row-major 8-bit
    * samples of exactly `outW`×`outH` (the strip/tile's declared raster
    * window; JPEG pads to 8-row/col MCUs, which are cropped). 12-bit
    * streams fail loudly here — use [[decodeRaster]]. */
  def decode(tables: Option[Array[Byte]], scan: Array[Byte],
      outW: Int, outH: Int): Array[Byte] = {
    val (prec, out) = decodeRaster(tables, scan, outW, outH, littleEndian = true)
    if (prec != 8)
      fail(s"$prec-bit stream through the 8-bit entry point — the raster " +
        "must be read as 16-bit storage (decodeRaster)")
    out
  }

  /** Decode one abbreviated-or-full Huffman-DCT stream (SOF0, SOF1 or
    * progressive SOF2; 8- or 12-bit) into (sample precision, row-major
    * samples) — one byte per sample for 8-bit, two bytes per sample in
    * `littleEndian` order for 12-bit (the TIFF layer stores 12-bit
    * rasters widened to 16-bit words). */
  def decodeRaster(tables: Option[Array[Byte]], scan: Array[Byte],
      outW: Int, outH: Int, littleEndian: Boolean): (Int, Array[Byte]) =
    try decodeImpl(tables, scan, outW, outH, littleEndian)
    catch { // uniform error contract: corruption surfaces as JpegError only
      case e: ArrayIndexOutOfBoundsException =>
        fail(s"corrupt stream (index ${e.getMessage})")
    }

  private def decodeImpl(tables: Option[Array[Byte]], scan: Array[Byte],
      outW: Int, outH: Int, littleEndian: Boolean): (Int, Array[Byte]) = {
    val st = tablesState(tables)
    var pos = parseSegments(scan, 0, st)
    if (pos < 0) fail("stream has no SOS scan")
    if (!st.sofSeen) fail("scan without a preceding SOF frame header")
    if (st.width < outW || st.height < outH)
      fail(s"frame ${st.width}x${st.height} smaller than the declared block ${outW}x$outH")
    val q = st.quant(st.quantId)
    if (q == null) fail(s"quantization table ${st.quantId} never defined")
    if (st.precision == 8 && st.quant16(st.quantId))
      fail("16-bit quantization table in an 8-bit frame (T.81 B.2.4.1 — " +
        "Pq=1 is legal only with 12-bit samples)")

    val prec = st.precision
    val mcusX = (st.width + 7) / 8
    val mcusY = (st.height + 7) / 8
    val totalMcus = mcusX * mcusY
    // quantized coefficients for the whole frame, accumulated across
    // scans (a sequential frame is the single full-band scan)
    val coef = new Array[Int](totalMcus * 64)
    // successive-approximation bookkeeping: the Al each coefficient's
    // scan chain currently stands at (-1 = no first scan yet)
    val curAl = Array.fill(64)(-1)
    var scans = 0
    while (pos >= 0) {
      if (!st.progressive) {
        if (scans > 0) fail("second scan in a sequential frame")
        if (st.ss != 0 || st.se != 63 || st.ah != 0 || st.al != 0)
          fail(s"sequential scan with progressive parameters " +
            s"Ss=${st.ss} Se=${st.se} Ah=${st.ah}/Al=${st.al} (must be 0/63/0/0)")
      } else {
        if (st.ss == 0 && st.se != 0)
          fail(s"progressive DC scan with Se=${st.se} (a Ss=0 scan is DC-only, T.81 G.1.1.1.1)")
        if (st.ss > 0 && (st.se < st.ss || st.se > 63))
          fail(s"progressive AC band Ss=${st.ss}..Se=${st.se} out of order")
        var k = st.ss
        val kEnd = if (st.ss == 0) 0 else st.se
        while (k <= kEnd) {
          if (st.ah == 0) {
            if (curAl(k) >= 0)
              fail(s"coefficient $k rescanned at Ah=0 (its first scan already ran — corrupt scan script)")
          } else {
            if (curAl(k) < 0)
              fail(s"refinement (Ah=${st.ah}) of coefficient $k before its first scan")
            if (curAl(k) != st.ah)
              fail(s"refinement of coefficient $k at Ah=${st.ah} but its chain stands at Al=${curAl(k)} " +
                "(successive approximation must step one bit at a time, T.81 G.1.1.1.2)")
            if (st.al != st.ah - 1)
              fail(s"refinement scan with Al=${st.al} != Ah-1=${st.ah - 1}")
          }
          curAl(k) = st.al
          k += 1
        }
      }
      pos = decodeScan(scan, pos, st, coef, totalMcus)
      scans += 1
      pos = parseSegments(scan, pos, st)
    }
    if (st.progressive) {
      // completeness: a script whose scans all validated can still be
      // INCOMPLETE (a band never scanned, or a chain parked above Al=0)
      // — that decodes to an approximation, which would violate the
      // never-silent stance (T.81 G: an interchange frame codes every
      // coefficient to full precision; partial decode is a progressive
      // PREVIEW, not this module's contract)
      var k = 0
      while (k < 64) {
        if (curAl(k) < 0)
          fail(s"incomplete progressive script: coefficient $k never scanned")
        if (curAl(k) != 0)
          fail(s"incomplete progressive script: coefficient $k's approximation " +
            s"chain stops at Al=${curAl(k)} (never refined to full precision)")
        k += 1
      }
    }

    // dequantize + IDCT every block
    val half = 1 << (prec - 1)       // level shift: +128 / +2048
    val maxv = (1 << prec) - 1       // clamp: 255 / 4095
    val storage = if (prec == 8) 1 else 2
    val out = new Array[Byte](outW * outH * storage)
    val dq = new Array[Int](64)
    val tmp = new Array[Double](64)
    var mcu = 0
    while (mcu < totalMcus) {
      val base = mcu * 64
      var i = 0
      while (i < 64) { dq(i) = coef(base + i) * q(i); i += 1 }
      // separable IDCT: rows then columns
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var u = 0
          while (u < 8) { s += Kernel(u * 8 + x) * dq(y * 8 + u); u += 1 }
          tmp(y * 8 + x) = s
          x += 1
        }
        y += 1
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var x = 0
      while (x < 8) {
        var yy = 0
        while (yy < 8) {
          var s = 0.0
          var v = 0
          while (v < 8) { s += Kernel(v * 8 + yy) * tmp(v * 8 + x); v += 1 }
          val px = mx * 8 + x
          val py = my * 8 + yy
          if (px < outW && py < outH) {
            val sample = math.round(s + half).toInt
            val v2 = math.max(0, math.min(maxv, sample))
            if (storage == 1) out(py * outW + px) = v2.toByte
            else {
              val b2 = (py * outW + px) * 2
              if (littleEndian) {
                out(b2) = (v2 & 0xff).toByte; out(b2 + 1) = (v2 >> 8).toByte
              } else {
                out(b2) = (v2 >> 8).toByte; out(b2 + 1) = (v2 & 0xff).toByte
              }
            }
          }
          yy += 1
        }
        x += 1
      }
      mcu += 1
    }
    (prec, out)
  }

  /** Decode one scan's entropy data (all MCUs) into the quantized
    * coefficient buffer; returns the position of the marker that ends
    * the scan. Sequential full-band, progressive DC first/refine and
    * AC first/refine all route through here per the SOS parameters. */
  private def decodeScan(scan: Array[Byte], start: Int, st: State,
      coef: Array[Int], totalMcus: Int): Int = {
    val dcScan = st.ss == 0
    val refining = st.ah > 0
    val dc = st.dcHuff(st.dcTableId)
    val ac = st.acHuff(st.acTableId)
    if (!st.progressive && (dc == null || ac == null))
      fail(s"Huffman tables dc=${st.dcTableId}/ac=${st.acTableId} never defined")
    if (st.progressive && dcScan && !refining && dc == null)
      fail(s"DC Huffman table ${st.dcTableId} never defined")
    if (st.progressive && !dcScan && ac == null)
      fail(s"AC Huffman table ${st.acTableId} never defined")
    val dcMax = if (st.precision == 12) 15 else 11 // T.81 F.1.2.1.2 table ranges
    val r = new BitReader(scan, start)
    var pred = 0
    var eobrun = 0
    val p1 = 1 << st.al
    val m1 = -p1
    var mcu = 0
    while (mcu < totalMcus) {
      if (st.restartInterval > 0 && mcu > 0 && mcu % st.restartInterval == 0) {
        // RSTn: byte-aligned marker; DC predictor and the EOB run reset
        r.align()
        if (r.pos + 1 >= scan.length || (scan(r.pos) & 0xff) != 0xff ||
            ((scan(r.pos + 1) & 0xff) & 0xf8) != 0xd0)
          fail(s"expected restart marker before MCU $mcu")
        r.pos += 2
        pred = 0
        eobrun = 0
      }
      val base = mcu * 64

      if (!st.progressive) {
        // sequential: DC + full AC band, one pass (T.81 F.2.2)
        val t = r.decode(dc)
        if (t > dcMax) fail(s"DC category $t out of range for ${st.precision}-bit samples")
        pred += extend(r.receive(t), t)
        coef(base) = pred
        var k = 1
        while (k < 64) {
          val rs = r.decode(ac)
          val run = rs >> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else k = 64            // EOB
          } else {
            k += run
            if (k > 63) fail("AC run overflows the block — corrupt stream")
            coef(base + ZigZag(k)) = extend(r.receive(size), size)
            k += 1
          }
        }
      } else if (dcScan && !refining) {
        // DC first scan (G.2): diff at point transform Al
        val t = r.decode(dc)
        if (t > dcMax) fail(s"DC category $t out of range for ${st.precision}-bit samples")
        pred += extend(r.receive(t), t)
        coef(base) = pred << st.al
      } else if (dcScan) {
        // DC refinement: one bit per block
        if (r.bit() == 1) coef(base) |= p1
      } else if (!refining) {
        // AC first scan (G.2.2): band coefficients at Al, EOBn runs
        if (eobrun > 0) eobrun -= 1
        else {
          var k = st.ss
          var brk = false
          while (k <= st.se && !brk) {
            val rs = r.decode(ac)
            val run = rs >> 4
            val size = rs & 0x0f
            if (size == 0) {
              if (run < 15) {
                // EOBn: this block plus (1<<run)+bits-1 more end here
                eobrun = (1 << run) - 1 + (if (run > 0) r.receive(run) else 0)
                brk = true
              } else k += 16 // ZRL
            } else {
              k += run
              if (k > st.se) fail("AC run overflows the spectral band — corrupt stream")
              coef(base + ZigZag(k)) = extend(r.receive(size), size) << st.al
              k += 1
            }
          }
        }
      } else {
        // AC refinement (G.1.2.3): one correction bit per already-
        // nonzero coefficient passed; new coefficients arrive as ±1<<Al
        var k = st.ss
        if (eobrun == 0) {
          var brk = false
          while (k <= st.se && !brk) {
            val rs = r.decode(ac)
            var run = rs >> 4
            val size = rs & 0x0f
            var newVal = 0
            if (size != 0) {
              if (size != 1)
                fail(s"AC refinement symbol with size $size (refinement places ±1 only) — corrupt stream")
              newVal = if (r.bit() == 1) p1 else m1
            } else if (run < 15) {
              // EOBn: covers this block too; the tail below consumes it
              eobrun = (1 << run) + (if (run > 0) r.receive(run) else 0)
              brk = true
            } // run == 15: ZRL — skip 16 zero-history coefficients below
            if (!brk) {
              var advancing = true
              while (k <= st.se && advancing) {
                val z = base + ZigZag(k)
                if (coef(z) != 0) {
                  if (r.bit() == 1 && (coef(z) & p1) == 0)
                    coef(z) += (if (coef(z) >= 0) p1 else m1)
                } else {
                  if (run == 0) advancing = false
                  else run -= 1
                }
                if (advancing) k += 1
              }
              if (newVal != 0) {
                if (k > st.se) fail("AC refinement places a coefficient beyond the band — corrupt stream")
                coef(base + ZigZag(k)) = newVal
              }
              k += 1
            }
          }
        }
        if (eobrun > 0) {
          // rest of the band: correction bits for nonzero history only
          while (k <= st.se) {
            val z = base + ZigZag(k)
            if (coef(z) != 0) {
              if (r.bit() == 1 && (coef(z) & p1) == 0)
                coef(z) += (if (coef(z) >= 0) p1 else m1)
            }
            k += 1
          }
          eobrun -= 1
        }
      }
      mcu += 1
    }
    r.pos // byte after the last entropy byte — the scan-ending marker
  }
}
