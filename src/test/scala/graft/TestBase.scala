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
