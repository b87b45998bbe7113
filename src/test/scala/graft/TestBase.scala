package graft

import graft.util.SparkUtil
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session (one JVM for the whole forked test run). */
object TestSpark {
  lazy val spark: SparkSession = SparkUtil.local("graft-test")
}

abstract class SparkFunSuite extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

/** Deterministic xorshift-based pseudo-gaussian for planted-fixture
  * specs (shared by the LSH/IVF recall suites). */
final class TestRng(seed0: Long) {
  private var s = seed0
  def nextLong(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
  def uniform(): Double = (nextLong() >>> 11) * (1.0 / (1L << 53))
  def gaussian(): Double = (uniform() + uniform() + uniform() + uniform() - 2.0) * 1.732
}
