package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * the forked test JVM). The PAssert analogue (reference:
  * SDK/testing/PAssert.java:263 containsInAnyOrder) is `assertRows`. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** containsInAnyOrder: compare ignoring row order (and Seq flavor);
    * delegates to the library's PAssert (graft.testing.PAssert). */
  def assertRows(df: org.apache.spark.sql.DataFrame, expected: Seq[Seq[Any]]): Unit =
    graft.testing.PAssert.containsInAnyOrder(df, expected)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
