package graft

/** Test-scope forward baseline-JPEG encoder (ITU T.81 Annex K tables)
  * and a minimal single-band JPEG-in-TIFF writer — the fixture twin of
  * `io/JpegDecoder` + `io/Tiff` compression 7. Supports full streams
  * (tables inline) and libtiff's split convention (tables-only stream
  * for tag 347, abbreviated per-strip scans), plus DRI/RSTn restart
  * runs. Quantization is caller-supplied: all-ones tables make the
  * DCT roundtrip near-lossless (block-constant images roundtrip
  * EXACTLY — a constant block is DC-only and the DC path is integer
  * all the way). */
object JpegFixture {

  val DcCounts: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcSymbols: Array[Int] = (0 to 11).toArray
  val AcCounts: Array[Int] = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcSymbols: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical code assignment: symbol → (code, length). */
  private def codesOf(counts: Array[Int], symbols: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < counts(l - 1)) {
        out += symbols(k) -> ((code, l))
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }
  private val DcCodes = codesOf(DcCounts, DcSymbols)
  private val AcCodes = codesOf(AcCounts, AcSymbols)

  // 12-bit DC table: categories 0..15 (T.81 F.1.2.1.2 allows DC diff
  // category up to 15 at 12-bit precision; Annex K's table stops at 11)
  val Dc12Counts: Array[Int] = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0)
  val Dc12Symbols: Array[Int] = (0 to 15).toArray
  private val Dc12Codes = codesOf(Dc12Counts, Dc12Symbols)

  // Progressive AC table: Annex K has no EOBn symbols (0x10..0xE0), so
  // progressive scans carry a flat all-256-symbol table instead (255
  // codes at length 9 + one at 10 — valid canonical prefix code;
  // fixture streams trade size for simplicity)
  val AcProgCounts: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0)
  val AcProgSymbols: Array[Int] = (0 to 255).toArray
  private val AcProgCodes = codesOf(AcProgCounts, AcProgSymbols)

  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var acc = 0
    private var n = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          buf += acc.toByte
          if (acc == 0xff) buf += 0.toByte // stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    /** 1-pad to a byte boundary (T.81 F.1.2.3). */
    def align(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
    def marker(m: Int): Unit = { align(); buf += 0xff.toByte; buf += m.toByte }
    def bytes: Array[Byte] = buf.toArray
  }

  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a > 0) { t += 1; a >>= 1 }
    t
  }

  /** FDCT + quantization of one level-shifted 8×8 block (natural
    * order in, natural order out). */
  private def fdctQuant(f: Array[Double], q: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        val cu = if (u == 0) math.sqrt(0.5) else 1.0
        val cv = if (v == 0) math.sqrt(0.5) else 1.0
        var s = 0.0
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            s += f(y * 8 + x) *
              math.cos((2 * x + 1) * u * math.Pi / 16.0) *
              math.cos((2 * y + 1) * v * math.Pi / 16.0)
            x += 1
          }
          y += 1
        }
        val c = cu * cv / 4.0 * s
        out(v * 8 + u) = math.round(c / q(v * 8 + u)).toInt
        u += 1
      }
      v += 1
    }
    out
  }

  private def putDqtDht(w: java.io.ByteArrayOutputStream, q: Array[Int],
      twelve: Boolean = false): Unit = {
    def seg(marker: Int, payload: Array[Int]): Unit = {
      w.write(0xff); w.write(marker)
      val len = payload.length + 2
      w.write(len >> 8); w.write(len & 0xff)
      payload.foreach(w.write)
    }
    if (twelve) // Pq=1/Tq=0: 16-bit entries (T.81 B.2.4.1, 12-bit only)
      seg(0xdb, Array(0x10) ++ ZigZag.map(q).flatMap(v => Array(v >> 8, v & 0xff)))
    else
      seg(0xdb, Array(0x00) ++ ZigZag.map(q)) // Pq=0/Tq=0, zig-zag order
    if (twelve) seg(0xc4, Array(0x00) ++ Dc12Counts ++ Dc12Symbols)
    else seg(0xc4, Array(0x00) ++ DcCounts ++ DcSymbols)
    seg(0xc4, Array(0x10) ++ AcCounts ++ AcSymbols)
  }

  /** Tables-only stream for TIFF tag 347 (SOI, DQT, DHTs, EOI). */
  def tablesStream(q: Array[Int], twelve: Boolean = false): Array[Byte] = {
    val w = new java.io.ByteArrayOutputStream()
    w.write(0xff); w.write(0xd8)
    putDqtDht(w, q, twelve)
    w.write(0xff); w.write(0xd9)
    w.toByteArray
  }

  /** Tables-only stream whose AC table is the progressive flat table
    * (EOBn symbols included) — tag 347 twin for SOF2 strips. */
  def tablesStreamProg(q: Array[Int], twelve: Boolean = false): Array[Byte] = {
    val w = new java.io.ByteArrayOutputStream()
    w.write(0xff); w.write(0xd8)
    putDqtDhtProg(w, q, twelve)
    w.write(0xff); w.write(0xd9)
    w.toByteArray
  }

  private def putDqtDhtProg(w: java.io.ByteArrayOutputStream, q: Array[Int],
      twelve: Boolean): Unit = {
    def seg(marker: Int, payload: Array[Int]): Unit = {
      w.write(0xff); w.write(marker)
      val len = payload.length + 2
      w.write(len >> 8); w.write(len & 0xff)
      payload.foreach(w.write)
    }
    if (twelve)
      seg(0xdb, Array(0x10) ++ ZigZag.map(q).flatMap(v => Array(v >> 8, v & 0xff)))
    else
      seg(0xdb, Array(0x00) ++ ZigZag.map(q))
    if (twelve) seg(0xc4, Array(0x00) ++ Dc12Counts ++ Dc12Symbols)
    else seg(0xc4, Array(0x00) ++ DcCounts ++ DcSymbols)
    seg(0xc4, Array(0x10) ++ AcProgCounts ++ AcProgSymbols)
  }

  /** One baseline scan stream over row-major 8-bit `pixels` (w×h).
    * Edge MCUs are edge-replicated. `withTables` = full stream;
    * false = abbreviated (tables ride tag 347). `sof1` emits the
    * extended-sequential frame marker instead of baseline (identical
    * scan structure at 8-bit). */
  def scanStream(pixels: Array[Byte], w0: Int, h: Int, q: Array[Int],
      withTables: Boolean, restartInterval: Int = 0,
      sof1: Boolean = false): Array[Byte] =
    encodeScan((x, y) => pixels(y * w0 + x) & 0xff, w0, h, q, 8, sof1,
      withTables, restartInterval)

  /** 12-bit extended-sequential (SOF1) scan over row-major `pixels`
    * in [0, 4095]; 16-bit DQT entries, DC categories to 15. */
  def scanStream12(pixels: Array[Int], w0: Int, h: Int, q: Array[Int],
      withTables: Boolean, restartInterval: Int = 0): Array[Byte] =
    encodeScan((x, y) => pixels(y * w0 + x), w0, h, q, 12, sof1 = true,
      withTables, restartInterval)

  private def encodeScan(pix: (Int, Int) => Int, w0: Int, h: Int,
      q: Array[Int], prec: Int, sof1: Boolean, withTables: Boolean,
      restartInterval: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val half = 1 << (prec - 1)
    val dcCodes = if (prec == 12) Dc12Codes else DcCodes
    out.write(0xff); out.write(0xd8) // SOI
    if (withTables) putDqtDht(out, q, twelve = prec == 12)
    // SOF0/SOF1: 1 component
    out.write(Array[Int](0xff, if (sof1) 0xc1 else 0xc0, 0, 11, prec,
      h >> 8, h & 0xff, w0 >> 8, w0 & 0xff, 1, 1, 0x11, 0).map(_.toByte).toArray)
    if (restartInterval > 0)
      out.write(Array[Int](0xff, 0xdd, 0, 4,
        restartInterval >> 8, restartInterval & 0xff).map(_.toByte).toArray)
    // SOS: 1 component, dc table 0 / ac table 0
    out.write(Array[Int](0xff, 0xda, 0, 8, 1, 0, 0x00, 0, 63, 0)
      .map(_.toByte).toArray)
    val bw = new BitWriter
    val mcusX = (w0 + 7) / 8
    val mcusY = (h + 7) / 8
    var pred = 0
    var rst = 0
    var mcu = 0
    val block = new Array[Double](64)
    while (mcu < mcusX * mcusY) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.marker(0xd0 + rst)
        rst = (rst + 1) % 8
        pred = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val px = math.min(mx * 8 + x, w0 - 1)
          val py = math.min(my * 8 + y, h - 1)
          block(y * 8 + x) = pix(px, py) - half.toDouble
          x += 1
        }
        y += 1
      }
      val coef = fdctQuant(block, q)
      // DC
      val diff = coef(0) - pred
      pred = coef(0)
      val t = category(diff)
      val (dcCode, dcLen) = dcCodes(t)
      bw.put(dcCode, dcLen)
      if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      // AC with ZRL/EOB
      var k = 1
      var run = 0
      while (k < 64) {
        val c = coef(ZigZag(k))
        if (c == 0) run += 1
        else {
          while (run > 15) { val (z, zl) = AcCodes(0xf0); bw.put(z, zl); run -= 16 }
          val s = category(c)
          val (code, len) = AcCodes((run << 4) | s)
          bw.put(code, len)
          bw.put(if (c < 0) c + (1 << s) - 1 else c, s)
          run = 0
        }
        k += 1
      }
      if (run > 0) { val (e, el) = AcCodes(0x00); bw.put(e, el) } // EOB
      mcu += 1
    }
    bw.align()
    out.write(bw.bytes)
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** One progressive (SOF2) scan: spectral band [ss, se] at
    * successive approximation Ah→Al (T.81 G.1.1.1). */
  final case class ProgScan(ss: Int, se: Int, ah: Int, al: Int)

  /** A libjpeg-shaped simple script: DC at Al=1, AC bands at Al=2,
    * then one-bit refinements down to Al=0 — complete, so the decoder
    * reconstructs the exact quantized coefficients. */
  val StandardScript: Seq[ProgScan] = Seq(
    ProgScan(0, 0, 0, 1), ProgScan(1, 5, 0, 2), ProgScan(6, 63, 0, 2),
    ProgScan(1, 63, 2, 1), ProgScan(0, 0, 1, 0), ProgScan(1, 63, 1, 0))

  /** Progressive (SOF2) multi-scan stream over row-major pixels —
    * 8-bit (`prec=8`, pixels in [0,255]) or 12-bit (`prec=12`,
    * [0,4095]). Same FDCT/quantization as the sequential encoder, so a
    * complete script must decode bit-identically to the sequential
    * stream of the same image. Encoding per T.81 G.1.2: arithmetic-
    * shift point transform for DC, magnitude-shift for AC, EOBn runs
    * accumulated across blocks (flushed at 0x7FFF, before restart
    * markers, and at scan end), and the G.1.2.3 correction-bit buffer
    * for refinement scans. */
  def progressiveStream(pix: (Int, Int) => Int, w0: Int, h: Int,
      q: Array[Int], prec: Int, withTables: Boolean,
      script: Seq[ProgScan] = StandardScript,
      restartInterval: Int = 0): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val half = 1 << (prec - 1)
    val dcCodes = if (prec == 12) Dc12Codes else DcCodes
    out.write(0xff); out.write(0xd8) // SOI
    if (withTables) putDqtDhtProg(out, q, twelve = prec == 12)
    out.write(Array[Int](0xff, 0xc2, 0, 11, prec, // SOF2, 1 component
      h >> 8, h & 0xff, w0 >> 8, w0 & 0xff, 1, 1, 0x11, 0).map(_.toByte).toArray)
    if (restartInterval > 0)
      out.write(Array[Int](0xff, 0xdd, 0, 4,
        restartInterval >> 8, restartInterval & 0xff).map(_.toByte).toArray)

    // quantized coefficient blocks, natural order (computed once)
    val mcusX = (w0 + 7) / 8
    val mcusY = (h + 7) / 8
    val total = mcusX * mcusY
    val blocks = new Array[Array[Int]](total)
    val buf = new Array[Double](64)
    var mcu = 0
    while (mcu < total) {
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val px = math.min(mx * 8 + x, w0 - 1)
          val py = math.min(my * 8 + y, h - 1)
          buf(y * 8 + x) = pix(px, py) - half.toDouble
          x += 1
        }
        y += 1
      }
      blocks(mcu) = fdctQuant(buf, q)
      mcu += 1
    }

    script.foreach { sc =>
      out.write(Array[Int](0xff, 0xda, 0, 8, 1, 0, 0x00, // SOS
        sc.ss, sc.se, (sc.ah << 4) | sc.al).map(_.toByte).toArray)
      val bw = new BitWriter
      encodeProgScan(bw, blocks, sc, dcCodes, restartInterval)
      bw.align()
      out.write(bw.bytes)
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  private def encodeProgScan(bw: BitWriter, blocks: Array[Array[Int]],
      sc: ProgScan, dcCodes: Map[Int, (Int, Int)], restartInterval: Int): Unit = {
    val dcScan = sc.ss == 0
    val refining = sc.ah > 0
    var pred = 0
    var rst = 0
    var eobrun = 0
    // correction bits pending under the EOB run (T.81 G.1.2.3: emitted
    // in coefficient order right after the EOBn symbol that flushes it)
    val ebits = scala.collection.mutable.ArrayBuffer.empty[Int]
    def putAc(sym: Int): Unit = { val (c, l) = AcProgCodes(sym); bw.put(c, l) }
    def flushEob(): Unit = if (eobrun > 0) {
      var nbits = 0
      var t = eobrun
      while ({ t >>= 1; t != 0 }) nbits += 1
      putAc(nbits << 4)
      if (nbits > 0) bw.put(eobrun & ((1 << nbits) - 1), nbits)
      ebits.foreach(b => bw.put(b, 1))
      ebits.clear()
      eobrun = 0
    }
    var mcu = 0
    while (mcu < blocks.length) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        flushEob()
        bw.marker(0xd0 + rst)
        rst = (rst + 1) % 8
        pred = 0
      }
      val coef = blocks(mcu)
      if (dcScan && !refining) {
        val v = coef(0) >> sc.al // arithmetic shift (T.81 G.1.2.1)
        val diff = v - pred
        pred = v
        val t = category(diff)
        val (dcCode, dcLen) = dcCodes(t)
        bw.put(dcCode, dcLen)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      } else if (dcScan) {
        bw.put((coef(0) >> sc.al) & 1, 1)
      } else if (!refining) {
        // AC first scan: values |c|>>Al (sign kept), EOBn runs
        var k = sc.ss
        var run = 0
        while (k <= sc.se) {
          val c = coef(ZigZag(k))
          val v = if (c < 0) -((-c) >> sc.al) else c >> sc.al
          if (v == 0) run += 1
          else {
            flushEob()
            while (run > 15) { putAc(0xf0); run -= 16 } // ZRL
            val s = category(v)
            putAc((run << 4) | s)
            bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) {
          eobrun += 1
          if (eobrun == 0x7fff) flushEob()
        }
      } else {
        // AC refinement (G.1.2.3 / the jcphuff shape): newly-nonzero
        // coefficients emit (run<<4)|1 + sign; already-nonzero ones
        // buffer one correction bit that rides after the next symbol
        val absv = new Array[Int](64)
        var lastNew = sc.ss - 1 // last k whose shifted magnitude is exactly 1
        var k = sc.ss
        while (k <= sc.se) {
          val a = math.abs(coef(ZigZag(k))) >> sc.al
          absv(k) = a
          if (a == 1) lastNew = k
          k += 1
        }
        var run = 0
        val br = scala.collection.mutable.ArrayBuffer.empty[Int]
        k = sc.ss
        while (k <= sc.se) {
          val a = absv(k)
          if (a == 0) run += 1
          else {
            // ZRLs only while a newly-nonzero coefficient still lies
            // ahead; otherwise the zeros fold into the EOB run
            while (run > 15 && k <= lastNew) {
              flushEob()
              putAc(0xf0)
              run -= 16
              br.foreach(b => bw.put(b, 1))
              br.clear()
            }
            if (a > 1) br += (a & 1) // history coefficient: correction bit
            else {
              flushEob()
              putAc((run << 4) | 1)
              bw.put(if (coef(ZigZag(k)) < 0) 0 else 1, 1)
              br.foreach(b => bw.put(b, 1))
              br.clear()
              run = 0
            }
          }
          k += 1
        }
        if (run > 0 || br.nonEmpty) {
          eobrun += 1
          ebits ++= br
          if (eobrun == 0x7fff) flushEob()
        }
      }
      mcu += 1
    }
    flushEob()
  }

  /** Minimal single-band progressive (SOF2) JPEG-compressed TIFF —
    * strip- or tile-organized, either byte order, optional split
    * tables (tag 347), 8- or 12-bit samples. */
  def writeJpegTiffProgressive(path: String, pix: (Int, Int) => Int,
      w: Int, h: Int, q: Array[Int], prec: Int, split: Boolean,
      tiled: Option[(Int, Int)] = None, restartInterval: Int = 0,
      bigendian: Boolean = false,
      script: Seq[ProgScan] = StandardScript): Unit = {
    val blocks: Seq[Array[Byte]] = tiled match {
      case Some((tw, th)) =>
        for {
          ty <- 0 until (h + th - 1) / th
          tx <- 0 until (w + tw - 1) / tw
        } yield progressiveStream((x, y) =>
            pix(math.min(tx * tw + x, w - 1), math.min(ty * th + y, h - 1)),
          tw, th, q, prec, withTables = !split, script, restartInterval)
      case None =>
        val rps = 8
        (0 until (h + rps - 1) / rps).map { s =>
          val rows = math.min(rps, h - s * rps)
          progressiveStream((x, y) => pix(x, s * rps + y), w, rows, q,
            prec, withTables = !split, script, restartInterval)
        }
    }
    writeContainer(path, blocks,
      if (split) Some(tablesStreamProg(q, twelve = prec == 12)) else None,
      w, h, prec, tiled, bigendian)
  }

  /** Minimal single-band 8-bit JPEG-compressed TIFF (strip- or
    * tile-organized, classic container, either byte order, optional
    * split tables via tag 347, SOF0 or SOF1 frames). */
  def writeJpegTiff(path: String, pixels: Array[Byte], w: Int, h: Int,
      q: Array[Int], split: Boolean, tiled: Option[(Int, Int)] = None,
      restartInterval: Int = 0, bigendian: Boolean = false,
      sof1: Boolean = false): Unit = {
    // blocks: full tiles (edge tiles carry the edge-replicated frame
    // the encoder pads to) or 8-row strips
    val blocks: Seq[Array[Byte]] = tiled match {
      case Some((tw, th)) =>
        for {
          ty <- 0 until (h + th - 1) / th
          tx <- 0 until (w + tw - 1) / tw
        } yield {
          val tp = new Array[Byte](tw * th)
          for (y <- 0 until th; x <- 0 until tw) {
            val sy = math.min(ty * th + y, h - 1)
            val sx = math.min(tx * tw + x, w - 1)
            tp(y * tw + x) = pixels(sy * w + sx)
          }
          scanStream(tp, tw, th, q, withTables = !split, restartInterval, sof1)
        }
      case None =>
        val rps = 8
        (0 until (h + rps - 1) / rps).map { s =>
          val rows = math.min(rps, h - s * rps)
          val sp = java.util.Arrays.copyOfRange(pixels, s * rps * w, (s * rps + rows) * w)
          scanStream(sp, w, rows, q, withTables = !split, restartInterval, sof1)
        }
    }
    writeContainer(path, blocks, if (split) Some(tablesStream(q)) else None,
      w, h, 8, tiled, bigendian)
  }

  /** 12-bit SOF1 JPEG TIFF: BitsPerSample=12, strip-organized (or
    * tiled), pixels in [0, 4095]. */
  def writeJpegTiff12(path: String, pixels: Array[Int], w: Int, h: Int,
      q: Array[Int], split: Boolean, tiled: Option[(Int, Int)] = None,
      bigendian: Boolean = false): Unit = {
    val blocks: Seq[Array[Byte]] = tiled match {
      case Some((tw, th)) =>
        for {
          ty <- 0 until (h + th - 1) / th
          tx <- 0 until (w + tw - 1) / tw
        } yield {
          val tp = new Array[Int](tw * th)
          for (y <- 0 until th; x <- 0 until tw) {
            val sy = math.min(ty * th + y, h - 1)
            val sx = math.min(tx * tw + x, w - 1)
            tp(y * tw + x) = pixels(sy * w + sx)
          }
          scanStream12(tp, tw, th, q, withTables = !split)
        }
      case None =>
        val rps = 8
        (0 until (h + rps - 1) / rps).map { s =>
          val rows = math.min(rps, h - s * rps)
          val sp = java.util.Arrays.copyOfRange(pixels, s * rps * w, (s * rps + rows) * w)
          scanStream12(sp, w, rows, q, withTables = !split)
        }
    }
    writeContainer(path, blocks,
      if (split) Some(tablesStream(q, twelve = true)) else None,
      w, h, 12, tiled, bigendian)
  }

  private def writeContainer(path: String, blocks: Seq[Array[Byte]],
      tables: Option[Array[Byte]], w: Int, h: Int, bits: Int,
      tiled: Option[(Int, Int)], bigendian: Boolean): Unit = {
    val bo = if (bigendian) java.nio.ByteOrder.BIG_ENDIAN
             else java.nio.ByteOrder.LITTLE_ENDIAN

    case class Tag(id: Int, typ: Int, count: Int, data: Array[Byte])
    def shortTag(id: Int, v: Int) = {
      val b = java.nio.ByteBuffer.allocate(2).order(bo); b.putShort(v.toShort)
      Tag(id, 3, 1, b.array())
    }
    def longArrTag(id: Int, vs: Seq[Long]) = {
      val b = java.nio.ByteBuffer.allocate(4 * vs.size).order(bo)
      vs.foreach(v => b.putInt(v.toInt))
      Tag(id, 4, vs.size, b.array())
    }
    val lens = blocks.map(_.length.toLong)
    val locationTags = tiled match {
      case Some((tw, th)) => Seq(
        shortTag(322, tw), shortTag(323, th),
        longArrTag(324, Seq.fill(blocks.size)(0L)), longArrTag(325, lens))
      case None => Seq(
        longArrTag(273, Seq.fill(blocks.size)(0L)),
        shortTag(278, 8), longArrTag(279, lens))
    }
    val tags0 = (Seq(
      shortTag(256, w), shortTag(257, h), shortTag(258, bits),
      shortTag(259, 7), shortTag(262, 1), shortTag(277, 1)) ++
      locationTags ++ Seq(shortTag(339, 1)) ++
      tables.map(t => Tag(347, 7, t.length, t)).toSeq)
      .sortBy(_.id)
    val ifdSize = 2 + tags0.size * 12 + 4
    var dataOff = 8L + ifdSize
    val withOffsets = tags0.map { t =>
      if (t.data.length > 4) { val o = dataOff; dataOff += t.data.length; (t, Some(o)) }
      else (t, None)
    }
    val blocksStart = dataOff
    val blockOffsets = lens.scanLeft(blocksStart)(_ + _).dropRight(1)
    val tags = withOffsets.map {
      case (t, o) if t.id == 273 || t.id == 324 =>
        val b = java.nio.ByteBuffer.allocate(4 * blocks.size).order(bo)
        blockOffsets.foreach(v => b.putInt(v.toInt))
        (t.copy(data = b.array()), o)
      case other => other
    }
    val total = (blocksStart + lens.sum).toInt
    val out = java.nio.ByteBuffer.allocate(total).order(bo)
    out.put(if (bigendian) 'M'.toByte else 'I'.toByte)
    out.put(if (bigendian) 'M'.toByte else 'I'.toByte)
    out.putShort(42)
    out.putInt(8)
    out.putShort(tags.size.toShort)
    tags.foreach { case (t, o) =>
      out.putShort(t.id.toShort)
      out.putShort(t.typ.toShort)
      out.putInt(t.count)
      val inline = o match {
        case Some(off) =>
          val b = java.nio.ByteBuffer.allocate(4).order(bo); b.putInt(off.toInt); b.array()
        case None => java.util.Arrays.copyOf(t.data, 4)
      }
      out.put(inline)
    }
    out.putInt(0) // next IFD
    tags.foreach { case (t, o) => if (o.isDefined) out.put(t.data) }
    blocks.foreach(out.put)
    java.nio.file.Files.write(java.nio.file.Paths.get(path), out.array())
  }
}
