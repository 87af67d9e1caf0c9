package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    graft.core.GraftSession.local(4)
  }
  val sf001 = "/root/testdata/sf0.001"
}
