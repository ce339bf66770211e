package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session across all suites (Spark startup dominates test
  * wall-clock otherwise). Config mirrors Verify.scala. */
object TestSpark {
  lazy val spark: SparkSession = {
    // the engine's own factory (installs graft.GraftExtensions, so the
    // SQL-registered native functions are testable)
    val s = GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .appName("graft-tests")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  /** Smallest fixture scale — golden assertions only. */
  val SF = "/root/testdata/sf0.001"
}
