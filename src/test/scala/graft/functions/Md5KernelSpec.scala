package graft.functions

import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** The allocation-free [[Md5Kernel]] must be bit-identical to the JCA
  * MD5 for EVERY input length (the padding fork at rem ≥ 56 and the
  * multi-block loop are the hazard zones), and the char-offset walk
  * must reproduce `substringSQL`'s byte ranges on multi-byte text. */
class Md5KernelSpec extends AnyFunSuite {

  private def jca(bytes: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)

  private def hiLo(d: Array[Byte]): (Long, Long) = {
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (d(i) & 0xFFL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (d(i) & 0xFFL); i += 1 }
    (hi, lo)
  }

  test("digest matches MessageDigest for every length 0..130 (covers both padding forks and 2 blocks)") {
    val rnd = new java.util.Random(42)
    val md = new Md5Kernel
    for (len <- 0 to 130; rep <- 0 until 5) {
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      md.digest(b, Platform.BYTE_ARRAY_OFFSET, len)
      val (hi, lo) = hiLo(jca(b))
      assert(md.hi === hi, s"hi mismatch at len=$len rep=$rep")
      assert(md.lo === lo, s"lo mismatch at len=$len rep=$rep")
      assert(md.head60 === (hi >>> 4))
    }
  }

  test("digest honors a nonzero base offset (reads exactly [off, off+len))") {
    val md = new Md5Kernel
    val buf = "XXXhello worldYYY".getBytes("UTF-8")
    md.digest(buf, Platform.BYTE_ARRAY_OFFSET + 3, 11)
    val (hi, lo) = hiLo(jca("hello world".getBytes("UTF-8")))
    assert(md.hi === hi && md.lo === lo)
  }

  test("charStarts reproduces substringSQL byte ranges, ASCII and multi-byte") {
    for (s <- Seq("", "a", "hello", "héllo wörld", "日本語テキスト abc", "aé中😀b")) {
      val u = UTF8String.fromString(s)
      val starts = Md5Kernel.charStarts(u)
      val nc = starts.length - 1
      assert(nc === u.numChars())
      assert(starts(nc) === u.numBytes)
      val whole = u.getBytes
      for (i <- 1 to math.max(nc - 4, 1); n <- Seq(3, 5)) {
        val expect = u.substringSQL(i, n).getBytes.toSeq
        val from = starts(i - 1)
        val until = starts(math.min(i - 1 + n, nc))
        assert(whole.slice(from, until).toSeq === expect, s"s=$s i=$i n=$n")
      }
    }
  }
}
