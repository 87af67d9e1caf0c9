package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.PortableHash

/** The fused digest-to-long hash must equal the composed
  * conv(substring(md5)) form bit-for-bit — that identity is what
  * keeps the DuckDB oracle twin valid. */
class Md5PrefixSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def check(df: org.apache.spark.sql.DataFrame,
                    c: org.apache.spark.sql.Column): Unit = {
    val bad = df.select(
        PortableHash.hash60(c).as("fused"),
        PortableHash.hash60Composed(c).as("composed"))
      .filter(!(col("fused") <=> col("composed")))
      .count()
    assert(bad == 0, s"$bad rows diverge")
  }

  test("fused == composed on adversarial literals") {
    val rows = Seq("", "a", " ", "éü中文",
      "0", "ffffffffffffffff", "the quick brown fox", "\n\t",
      "a" * 1000).toDF("s")
    check(rows, col("s"))
    // interpreted path too (codegen can be bypassed): force eval via
    // a non-codegen context is covered by the HOF usage below
  }

  test("fused == composed across real document shingles, and inside " +
       "a higher-order-function lambda (interpreted eval path)") {
    val d = Tables.load(spark, TestSpark.sf001, "documents")
    val sh = d.select(explode(graft.functions.Text.shingles(col("text"), 3))
      .as("s"))
    check(sh, col("s"))
    // interpreted: the expression evaluated inside transform()
    def checksum(h: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      d.select(explode(transform(
          graft.functions.Text.words(col("text")), w => h(w))).as("h"))
        .agg(sum(pmod(col("h"), lit(1000003L)))).as[Long].head()
    assert(checksum(PortableHash.hash60) ==
      checksum(PortableHash.hash60Composed))
  }
}
