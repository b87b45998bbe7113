package graft.io

/** Minimal HDF5 reader — enough to ingest the reference's SLC products
  * (h5py-written files: v0 superblock, v1 object headers, symbol-table
  * groups, contiguous/compact datasets) without any native library.
  *
  * Scope (reference semantics, `slc_datacube.py:118-219`):
  *   - root-group dataset iteration (the SLC metadata read walks all
  *     keys), subgroups one level down (the `RPC` group);
  *   - datatypes: fixed-point, IEEE float, fixed strings, and
  *     variable-length strings via the global heap (h5py stores python
  *     str as vlen);
  *   - layouts: contiguous + compact (h5py's default for these files;
  *     chunked ⇒ clear error).
  *
  * Like [[Tiff]], parsing is expressed against a positional reader so the
  * metadata crawl touches only structure bytes and small metadata
  * payloads — never the pixel datasets — regardless of raster size.
  */
object Hdf5 {

  type ReadAt = (Long, Int) => Array[Byte]

  private val Undef = -1L // 0xFFFF… addresses

  sealed trait Dtype
  final case class FixedPoint(size: Int, signed: Boolean, littleEndian: Boolean) extends Dtype
  final case class FloatPoint(size: Int, littleEndian: Boolean) extends Dtype
  final case class FixedString(size: Int) extends Dtype
  case object VlenString extends Dtype

  sealed trait Layout
  final case class Contiguous(off: Long, size: Long) extends Layout
  final case class Compact(data: Array[Byte]) extends Layout
  /** Chunked storage: v1 chunk B-tree + per-chunk dims (without the
    * trailing element-size entry); `deflate` from the filter pipeline. */
  final case class Chunked(btreeAddr: Long, chunkDims: Seq[Long], deflate: Boolean) extends Layout

  /** One dataset: dims (empty = scalar), element type, storage. */
  final case class Dataset(name: String, dims: Seq[Long], dtype: Dtype, layout: Layout) {
    def elementCount: Long = if (dims.isEmpty) 1L else dims.product
  }

  final class File(read: ReadAt) {

    private def u(b: Array[Byte], i: Int, n: Int): Long = {
      var v = 0L
      var j = 0
      while (j < n) { v |= (b(i + j) & 0xffL) << (8 * j); j += 1 }
      v
    }
    private def addr(b: Array[Byte], i: Int): Long = {
      val v = u(b, i, 8)
      if (v == -1L) Undef else v
    }

    private val rootOhdr: Long = {
      val head = read(0L, 56)
      require(head.take(8).sameElements(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')),
        "not an HDF5 file: bad signature")
      require(head(8) == 0, s"unsupported HDF5 superblock version ${head(8)}")
      require(head(13) == 8 && head(14) == 8, "only 8-byte offsets/lengths supported")
      // root symbol-table entry directly after the 56-byte v0 superblock
      // body: link name offset(8), object header address(8)
      val ste = read(56L, 16)
      addr(ste, 8)
    }

    /** v1 object header → (msgType, body) list, following continuations. */
    private def messages(ohdrAddr: Long): Seq[(Int, Array[Byte])] = {
      val prefix = read(ohdrAddr, 16)
      require(prefix(0) == 1, s"unsupported object header version ${prefix(0)} at $ohdrAddr")
      val nMsgs = u(prefix, 2, 2).toInt
      val firstSize = u(prefix, 8, 4).toInt
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      var blocks = List((ohdrAddr + 16, firstSize))
      while (blocks.nonEmpty && out.size < nMsgs) {
        val (bOff, bSize) = blocks.head
        blocks = blocks.tail
        val blk = read(bOff, bSize)
        var p = 0
        while (p + 8 <= bSize && out.size < nMsgs) {
          val mType = u(blk, p, 2).toInt
          val mSize = u(blk, p + 2, 2).toInt
          val body = java.util.Arrays.copyOfRange(blk, p + 8, p + 8 + mSize)
          if (mType == 0x10) // continuation: (addr, length)
            blocks = blocks :+ ((u(body, 0, 8), u(body, 8, 8).toInt))
          else if (mType != 0x00) // skip NIL messages
            out += ((mType, body))
          p += 8 + mSize
        }
      }
      out.toSeq
    }

    /** Walk a v1 group B-tree down to its SNOD leaf addresses. */
    private def snodAddrs(btreeAddr: Long): Seq[Long] = {
      val head = read(btreeAddr, 8)
      require(new String(head, 0, 4) == "TREE", s"expected TREE node at $btreeAddr")
      val level = head(5).toInt
      val n = u(head, 6, 2).toInt
      // sig(4) type(1) level(1) n(2) left(8) right(8), then key0 child0 key1 …
      val body = read(btreeAddr + 24, n * 16 + 8)
      val children = (0 until n).map(i => u(body, 8 + i * 16, 8))
      if (level == 0) children
      else children.flatMap(snodAddrs)
    }

    /** NUL-terminated name at `off` inside a local heap data segment. */
    private def heapName(dataSegAddr: Long, off: Long): String = {
      val sb = new StringBuilder
      var p = dataSegAddr + off
      var chunk = read(p, 64)
      var i = 0
      while (chunk(i) != 0) {
        sb.append(chunk(i).toChar)
        i += 1
        if (i == chunk.length) { p += chunk.length; chunk = read(p, 64); i = 0 }
      }
      sb.toString()
    }

    /** (name → object header address) for a group's object header. */
    private def groupEntriesOf(ohdrAddr: Long): Seq[(String, Long)] = {
      val stab = messages(ohdrAddr).collectFirst { case (0x11, b) => b }
        .getOrElse(throw new IllegalArgumentException(s"object at $ohdrAddr is not a symbol-table group"))
      val btree = u(stab, 0, 8)
      val heap = u(stab, 8, 8)
      val heapHead = read(heap, 32)
      require(new String(heapHead, 0, 4) == "HEAP", s"expected HEAP at $heap")
      val dataSeg = u(heapHead, 24, 8)
      snodAddrs(btree).flatMap { sa =>
        val sh = read(sa, 8)
        require(new String(sh, 0, 4) == "SNOD", s"expected SNOD at $sa")
        val n = u(sh, 6, 2).toInt
        val entries = read(sa + 8, n * 40)
        (0 until n).map { i =>
          (heapName(dataSeg, u(entries, i * 40, 8)), u(entries, i * 40 + 8, 8))
        }
      }
    }

    /** Root-group entries (sorted by name, as stored). */
    lazy val rootEntries: Seq[(String, Long)] = groupEntriesOf(rootOhdr)

    /** Entries of a subgroup named at root (e.g. "RPC"), None when the
      * object is a dataset or absent. */
    def subgroupEntries(name: String): Option[Seq[(String, Long)]] =
      rootEntries.collectFirst { case (`name`, a) if isGroup(a) => groupEntriesOf(a) }

    def isGroup(ohdrAddr: Long): Boolean =
      messages(ohdrAddr).exists(_._1 == 0x11)

    /** Parse a dataset object header. */
    def dataset(name: String, ohdrAddr: Long): Dataset = {
      var dims: Seq[Long] = Seq.empty
      var dtype: Dtype = null
      var layout: Layout = null
      var deflate = false
      messages(ohdrAddr).foreach {
        case (0x0b, b) => // filter pipeline: detect gzip/deflate (id 1)
          val nFilters = b(1).toInt
          var p = 8
          var i = 0
          while (i < nFilters && p + 8 <= b.length) {
            val id = u(b, p, 2).toInt
            val nameLen = u(b, p + 2, 2).toInt
            val nValues = u(b, p + 6, 2).toInt
            if (id == 1) deflate = true
            p += 8 + (nameLen + 7) / 8 * 8 + nValues * 4 + (if (nValues % 2 == 1) 4 else 0)
            i += 1
          }
        case (0x01, b) => // dataspace (v1)
          require(b(0) == 1, s"unsupported dataspace version ${b(0)} in $name")
          val rank = b(1).toInt
          dims = (0 until rank).map(i => u(b, 8 + 8 * i, 8))
        case (0x03, b) => // datatype
          val cls = b(0) & 0x0f
          val le = (b(1) & 0x01) == 0
          val size = u(b, 4, 4).toInt
          dtype = cls match {
            case 0 => FixedPoint(size, signed = (b(1) & 0x08) != 0, littleEndian = le)
            case 1 => FloatPoint(size, littleEndian = le)
            case 3 => FixedString(size)
            case 9 => VlenString // h5py str: vlen of 1-byte chars
            case c => throw new IllegalArgumentException(s"unsupported datatype class $c in $name")
          }
        case (0x08, b) => // data layout (v3)
          require(b(0) == 3, s"unsupported layout version ${b(0)} in $name")
          layout = b(1) match {
            case 1 => Contiguous(u(b, 2, 8), u(b, 10, 8))
            case 0 =>
              val sz = u(b, 2, 2).toInt
              Compact(java.util.Arrays.copyOfRange(b, 4, 4 + sz))
            case 2 => // chunked: dimensionality(1), btree(8), dims u32 each
              val ndims = b(2).toInt // = rank + 1 (trailing element size)
              val chunkDims = (0 until ndims - 1).map(i => u(b, 11 + 4 * i, 4))
              Chunked(u(b, 3, 8), chunkDims, deflate = false) // deflate patched below
            case c => throw new IllegalArgumentException(s"unsupported layout class $c in $name")
          }
        case _ => ()
      }
      require(dtype != null && layout != null, s"$name: missing datatype/layout message")
      layout = layout match {
        case c: Chunked => c.copy(deflate = deflate)
        case l          => l
      }
      Dataset(name, dims, dtype, layout)
    }

    /** Chunk B-tree (v1, node type 1) → (dataAddr, storedSize, origin). */
    private def chunkEntries(btreeAddr: Long, rank: Int): Seq[(Long, Int, Seq[Long])] = {
      val head = read(btreeAddr, 8)
      require(new String(head, 0, 4) == "TREE", s"expected chunk TREE at $btreeAddr")
      require(head(4) == 1, "expected a raw-data chunk B-tree (type 1)")
      val level = head(5).toInt
      val n = u(head, 6, 2).toInt
      val keySize = 8 + 8 * (rank + 1) // size(4) + mask(4) + offsets u64 × (rank+1)
      val body = read(btreeAddr + 24, n * (keySize + 8) + keySize)
      (0 until n).flatMap { i =>
        val kOff = i * (keySize + 8)
        val storedSize = u(body, kOff, 4).toInt
        val origin = (0 until rank).map(d => u(body, kOff + 8 + 8 * d, 8))
        val child = u(body, kOff + keySize, 8)
        if (level > 0) chunkEntries(child, rank)
        else Seq((child, storedSize, origin))
      }
    }

    private def rawData(ds: Dataset): Array[Byte] = ds.layout match {
      case Compact(d)          => d
      case Contiguous(off, sz) => read(off, sz.toInt)
    }

    /** Numeric dataset → doubles (row-major), assembling chunks when the
      * layout is chunked (inflating gzip'd chunks per the filter
      * pipeline). */
    def readDoubles(ds: Dataset): Array[Double] = ds.layout match {
      case c: Chunked =>
        val rank = ds.dims.size
        val out = new Array[Double](ds.elementCount.toInt)
        val elemSize = ds.dtype match {
          case FixedPoint(s, _, _) => s
          case FloatPoint(s, _)    => s
          case t => throw new IllegalArgumentException(s"${ds.name}: not numeric ($t)")
        }
        val chunkElems = c.chunkDims.product.toInt
        chunkEntries(c.btreeAddr, rank).foreach { case (addr, storedSize, origin) =>
          val stored = read(addr, storedSize)
          val raw =
            if (!c.deflate) stored
            else {
              val inf = new java.util.zip.Inflater()
              inf.setInput(stored)
              val buf = new Array[Byte](chunkElems * elemSize)
              var done = 0
              var stalled = false
              while (done < buf.length && !inf.finished() && !stalled) {
                val n = inf.inflate(buf, done, buf.length - done)
                // truncated stream: inflate()==0 forever — fail instead
                stalled = n == 0 && (inf.needsInput() || inf.needsDictionary())
                done += n
              }
              inf.end()
              require(done == buf.length,
                s"${ds.name}: gzip'd chunk inflated to $done of ${buf.length} bytes")
              buf
            }
          val vals = decodeNumeric(raw, chunkElems, ds.dtype, ds.name)
          // place chunk elements (row-major within chunkDims); clip edge
          // chunks that overhang the dataset dims
          val strides = Array.tabulate(rank)(d => (d + 1 until rank).map(c.chunkDims(_)).product)
          var i = 0
          while (i < chunkElems) {
            var rem = i.toLong
            var linear = 0L
            var inside = true
            var d = 0
            while (d < rank) {
              val local = rem / strides(d)
              rem = rem % strides(d)
              val coord = origin(d) + local
              if (coord >= ds.dims(d)) inside = false
              linear = linear * ds.dims(d) + coord
              d += 1
            }
            if (inside) out(linear.toInt) = vals(i)
            i += 1
          }
        }
        out
      case _ => decodeNumeric(rawData(ds), ds.elementCount.toInt, ds.dtype, ds.name)
    }

    private def decodeNumeric(d: Array[Byte], n: Int, dtype: Dtype, name: String): Array[Double] = {
      dtype match {
        case FixedPoint(size, signed, le) =>
          Array.tabulate(n) { i =>
            var v = 0L
            var j = 0
            while (j < size) {
              val b = d(i * size + j) & 0xffL
              v |= (if (le) b << (8 * j) else b << (8 * (size - 1 - j)))
              j += 1
            }
            if (signed && size < 8) { // sign-extend
              val shift = 64 - size * 8
              v = (v << shift) >> shift
            }
            v.toDouble
          }
        case FloatPoint(4, le) =>
          Array.tabulate(n) { i =>
            val bits = u(d, i * 4, 4).toInt
            val v = if (le) bits else Integer.reverseBytes(bits)
            java.lang.Float.intBitsToFloat(v).toDouble
          }
        case FloatPoint(8, le) =>
          Array.tabulate(n) { i =>
            val bits = u(d, i * 8, 8)
            val v = if (le) bits else java.lang.Long.reverseBytes(bits)
            java.lang.Double.longBitsToDouble(v)
          }
        case t => throw new IllegalArgumentException(s"$name: not a numeric dataset ($t)")
      }
    }

    /** Scalar string dataset → value (fixed or vlen via global heap). */
    def readString(ds: Dataset): String = {
      val d = rawData(ds)
      ds.dtype match {
        case FixedString(_) =>
          val end = d.indexWhere(_ == 0) match { case -1 => d.length; case i => i }
          new String(d, 0, end, java.nio.charset.StandardCharsets.UTF_8)
        case VlenString =>
          // vlen descriptor: length(4), global-heap collection addr(8), index(4)
          val len = u(d, 0, 4).toInt
          val gcol = u(d, 4, 8)
          val idx = u(d, 12, 4).toInt
          readGlobalHeapObject(gcol, idx, len)
        case t => throw new IllegalArgumentException(s"${ds.name}: not a string dataset ($t)")
      }
    }

    private def readGlobalHeapObject(gcolAddr: Long, index: Int, len: Int): String = {
      val head = read(gcolAddr, 16)
      require(new String(head, 0, 4) == "GCOL", s"expected GCOL at $gcolAddr")
      var p = gcolAddr + 16
      while (true) {
        val oh = read(p, 16)
        val idx = u(oh, 0, 2).toInt
        val size = u(oh, 8, 8)
        if (idx == index) {
          val data = read(p + 16, len)
          return new String(data, java.nio.charset.StandardCharsets.UTF_8)
        }
        require(idx != 0, s"global heap object $index not found in collection at $gcolAddr")
        p += 16 + (size + 7) / 8 * 8
      }
      throw new IllegalStateException("unreachable")
    }
  }

  def fromBytes(data: Array[Byte]): File =
    new File((off, len) => java.util.Arrays.copyOfRange(
      data, off.toInt, math.min(data.length, off.toInt + len)))

  /** Header/metadata reads via seeks — never loads pixel datasets. */
  def open(path: String): (File, java.io.RandomAccessFile) = {
    val raf = new java.io.RandomAccessFile(path, "r")
    val readAt: ReadAt = (off, len) => {
      val n = math.min(len.toLong, raf.length() - off).toInt
      val buf = new Array[Byte](math.max(n, 0))
      raf.seek(off)
      raf.readFully(buf)
      buf
    }
    (new File(readAt), raf)
  }
}
