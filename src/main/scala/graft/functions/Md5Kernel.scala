package graft.functions

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-free MD5 (RFC 1321) over a raw byte range — the shared
  * digest kernel behind the shingle/token hash expressions
  * ([[ShingleHashes]], [[MinhashSigs]], [[MinShingleMd5]], [[OphSlots]],
  * [[SimhashSig]], [[WinnowFingerprints]]).
  *
  * Why not `java.security.MessageDigest`: those expressions hash one
  * 5-character shingle per corpus CHARACTER, so the per-call constant
  * dominates — `substringSQL` allocates a UTF8String, `getBytes`
  * copies it, `digest()` allocates the 16-byte result, and the JCA
  * dispatch/reset cost exceeds the 64 MD5 rounds for a 5-byte input.
  * This kernel reads bytes straight out of the row buffer via
  * `Platform` (on- or off-heap), keeps the running state in fields,
  * and reuses one 64-byte scratch block — zero allocation per digest.
  * Output is bit-identical to MessageDigest MD5 (Md5KernelSpec
  * property-checks every length 0..130 against the JCA digest).
  *
  * Instances are cheap (two small arrays); expressions allocate one
  * per ROW and amortize it over the row's shingles. Not thread-safe.
  */
final class Md5Kernel {
  private val m = new Array[Int](16) // current block as little-endian words
  private val tail = new Array[Byte](64) // final padded block(s) scratch
  private var hA = 0
  private var hB = 0
  private var hC = 0
  private var hD = 0

  /** Digest `len` bytes at (base, off). Result via [[head60]]/[[hi]]/[[lo]]. */
  def digest(base: AnyRef, off: Long, len: Int): Unit = {
    hA = 0x67452301; hB = 0xefcdab89; hC = 0x98badcfe; hD = 0x10325476
    var p = 0
    while (len - p >= 64) {
      var w = 0
      while (w < 16) {
        val o = off + p + 4 * w
        m(w) = (Platform.getByte(base, o) & 0xFF) |
          ((Platform.getByte(base, o + 1) & 0xFF) << 8) |
          ((Platform.getByte(base, o + 2) & 0xFF) << 16) |
          ((Platform.getByte(base, o + 3) & 0xFF) << 24)
        w += 1
      }
      processBlock()
      p += 64
    }
    val rem = len - p
    var i = 0
    while (i < rem) { tail(i) = Platform.getByte(base, off + p + i); i += 1 }
    tail(rem) = 0x80.toByte
    i = rem + 1
    if (rem >= 56) { // length words don't fit: pad out this block, emit one more
      while (i < 64) { tail(i) = 0; i += 1 }
      loadTail(); processBlock()
      i = 0
    }
    while (i < 56) { tail(i) = 0; i += 1 }
    val bitLen = len.toLong << 3
    var j = 0
    while (j < 8) { tail(56 + j) = ((bitLen >>> (8 * j)) & 0xFF).toByte; j += 1 }
    loadTail(); processBlock()
  }

  /** Digest a whole UTF8String (no copy — reads its backing buffer). */
  def digest(s: UTF8String): Unit =
    digest(s.getBaseObject, s.getBaseOffset, s.numBytes)

  private def loadTail(): Unit = {
    var w = 0
    while (w < 16) {
      m(w) = (tail(4 * w) & 0xFF) |
        ((tail(4 * w + 1) & 0xFF) << 8) |
        ((tail(4 * w + 2) & 0xFF) << 16) |
        ((tail(4 * w + 3) & 0xFF) << 24)
      w += 1
    }
  }

  private def processBlock(): Unit = {
    val K = Md5Kernel.K
    val S = Md5Kernel.S
    var a = hA; var b = hB; var c = hC; var d = hD
    var i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + K(i) + m(g), S(i))
      a = tmp
      i += 1
    }
    hA += a; hB += b; hC += c; hD += d
  }

  /** Digest bytes 0..7 as a big-endian unsigned long (the value of the
    * first 16 hex chars). */
  def hi: Long =
    java.lang.Long.reverseBytes((hB.toLong << 32) | (hA & 0xFFFFFFFFL))

  /** Digest bytes 8..15 as a big-endian unsigned long. */
  def lo: Long =
    java.lang.Long.reverseBytes((hD.toLong << 32) | (hC & 0xFFFFFFFFL))

  /** Leading 60 bits of the digest — the integer value of the first 15
    * hex chars, the [[MinhashSigs.head60]] convention. */
  def head60: Long = hi >>> 4
}

object Md5Kernel {
  // K(i) = floor(abs(sin(i+1)) * 2^32), the RFC 1321 sine table.
  private val K: Array[Int] = Array.tabulate(64) { i =>
    ((math.abs(math.sin(i + 1.0)) * 4294967296.0).toLong & 0xFFFFFFFFL).toInt
  }
  private val S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  /** Byte offset of each character start, plus a final entry = numBytes
    * (length numChars+1). Shingle (1-based char pos i, width n) covers
    * bytes [starts(i-1), starts(min(i-1+n, numChars))) — exactly the
    * bytes `substringSQL(i, n)` would copy out. One linear walk per row
    * replaces one UTF8String + byte[] allocation per SHINGLE. */
  def charStarts(text: UTF8String): Array[Int] = {
    val nb = text.numBytes
    val base = text.getBaseObject
    val off = text.getBaseOffset
    // worst case one char per byte; trim to fit only if multi-byte seen
    val buf = new Array[Int](nb + 1)
    var i = 0
    var c = 0
    while (i < nb) {
      buf(c) = i
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
      c += 1
    }
    buf(c) = nb
    if (c == nb) buf else java.util.Arrays.copyOf(buf, c + 1)
  }
}
