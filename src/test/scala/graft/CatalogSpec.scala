package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.core.Catalog

/** Idempotent DDL (S8): create-if-not-exists over parquet locations. */
class CatalogSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("ensureTable is idempotent and reads back written data") {
    val dir = Files.createTempDirectory("graft_cat").toString + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .write.parquet(dir)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("tag", StringType)))
    Catalog.ensureTable(spark, "cat_t", schema, dir)
    assert(Catalog.tableExists(spark, "cat_t"))
    assert(spark.sql("SELECT count(*) FROM cat_t").head().getLong(0) == 2)
    // second DDL run is a no-op, not an error
    Catalog.ensureTable(spark, "cat_t", schema, dir)
    assert(spark.sql("SELECT count(*) FROM cat_t").head().getLong(0) == 2)
    Catalog.dropTable(spark, "cat_t")
    assert(!Catalog.tableExists(spark, "cat_t"))
  }
}
