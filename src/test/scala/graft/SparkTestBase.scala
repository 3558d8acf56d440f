package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites — one JVM-wide session, the
  * pattern of the reference's AbstractSparkTest
  * (marmaray/src/test/java/com/uber/marmaray/common/util/AbstractSparkTest.java:36-55),
  * minus the per-test teardown (a shared session keeps the suite fast; each
  * test uses its own temp dirs for isolation).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession.builder("graft-test", "local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def tmpDir(prefix: String = "graft-test"): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
