package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

import graft.core.Session

/** Shared local session for all suites — one JVM-wide SparkSession
  * (getOrCreate) so the suite run pays startup once.
  */
trait TestSpark { this: Suite =>
  lazy val spark: SparkSession = TestSpark.shared
}

object TestSpark {
  lazy val shared: SparkSession = {
    val s = Session.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
