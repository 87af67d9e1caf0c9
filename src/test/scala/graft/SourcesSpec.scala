package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Ingest, JsonSources}

/** Source-adapter semantics: GBFS/WAQI/OpenWeather flattening with
  * the reference's null-tolerant nested access (P2), reject channels,
  * CSV round-trip. Payload shapes from FIXTURES.md. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val batchTs = Timestamp.valueOf("2024-01-15 11:45:00")

  test("GBFS: one row per bike, batch timestamp stamped once") {
    val payload =
      """{"data":{"bikes":[
        |{"bike_id":"b1","provider_id":"p1","lat":47.37,"lon":8.54,
        | "is_reserved":false,"is_disabled":false,"extra_field":1},
        |{"bike_id":"b2","provider_id":"p1","lat":46.94,"lon":7.44,
        | "is_reserved":true,"is_disabled":false}]}}""".stripMargin
        .replace("\n", "")
    val out = JsonSources.parseGbfs(Seq(payload).toDF("raw"), "raw", batchTs)
      .orderBy("bike_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[String]("bike_id") == "b1")
    assert(out(0).getAs[Boolean]("is_reserved") == false)
    assert(out.forall(_.getAs[Timestamp]("timestamp") == batchTs))
  }

  test("WAQI: absent iaqi fields become nulls (.get chains)") {
    val full = """{"status":"ok","data":{"aqi":42,"iaqi":{
      |"t":{"v":11.5},"h":{"v":78.0},"pm25":{"v":12.0}}}}"""
      .stripMargin.replace("\n", "")
    val partial = """{"status":"ok","data":{"aqi":17,"iaqi":{"t":{"v":9.0}}}}"""
    val out = JsonSources.parseWaqi(
      Seq(("zurich", full), ("bern", partial)).toDF("city", "raw"),
      "city", "raw").orderBy("city").collect()
    val bern = out(0)
    assert(bern.getAs[Int]("aqi") == 17)
    assert(bern.getAs[Double]("temperature") == 9.0)
    assert(bern.isNullAt(bern.fieldIndex("humidity")))
    assert(bern.isNullAt(bern.fieldIndex("pm25")))
  }

  test("OpenWeather: empty pollution list yields null aqi/pm25") {
    val weather = """{"name":"Zurich","main":{"temp":11.2,"humidity":81},
      |"weather":[{"description":"mist"}],"wind":{"speed":2.5}}"""
      .stripMargin.replace("\n", "")
    val pollutionOk = """{"list":[{"main":{"aqi":2},"components":{"pm2_5":7.1}}]}"""
    val pollutionEmpty = """{"list":[]}"""
    val out = JsonSources.parseWeather(
      Seq(("zurich", weather, pollutionOk), ("bern", weather, pollutionEmpty))
        .toDF("city", "w", "p"), "city", "w", "p", batchTs)
      .orderBy("city").collect()
    assert(out(1).getAs[Int]("aqi") == 2)          // zurich
    assert(out(1).getAs[Double]("pm25") == 7.1)
    assert(out(0).isNullAt(out(0).fieldIndex("aqi")))  // bern: empty list
    assert(out(0).getAs[Double]("temperature") == 11.2)
  }

  test("reject channel splits malformed documents") {
    val rows = Seq("""{"data":{"bikes":[]}}""", "not json at all")
    val (good, rejects) = JsonSources.withRejects(
      rows.toDF("raw"), "raw", JsonSources.gbfsSchema, "data")
    assert(good.count() == 1)
    assert(rejects.count() == 1)
    assert(rejects.select("raw").as[String].head() == "not json at all")
  }

  test("CSV round-trip with header; corrupt lines land in rejects") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val schema = StructType(Seq(
      StructField("city", StringType), StructField("temp", DoubleType)))
    Files.writeString(java.nio.file.Paths.get(s"$dir/in.csv"),
      "city,temp\nzurich,11.5\nbern,notanumber\nbasel,9.0\n")
    val (good, rejects) = Ingest.readCsv(spark, s"$dir/in.csv", schema)
    assert(good.count() == 2)
    assert(rejects.count() == 1)

    Ingest.writeCsv(good, s"$dir/out")
    val back = spark.read.option("header", "true").schema(schema)
      .csv(s"$dir/out")
    assert(back.count() == 2)
  }

  test("JSONL round-trip under an enforced schema; corrupt lines " +
       "land in rejects") {
    val dir = Files.createTempDirectory("graft_jsonl").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val src = Seq((1L, "plain"), (2L, "quotes \" and \\ slashes"),
      (3L, "tabs\tand\nnewlines")).toDF("id", "txt")
    Ingest.writeJson(src, s"$dir/out")
    val (good, rejects) = Ingest.readJson(spark, s"$dir/out", schema)
    assert(rejects.count() == 0)
    // escaping must round-trip bit-for-bit, including the newline
    assert(good.orderBy("id").as[(Long, String)].collect().toSeq ==
      src.orderBy("id").as[(Long, String)].collect().toSeq)

    Files.writeString(java.nio.file.Paths.get(s"$dir/bad.json"),
      """{"id": 9, "txt": "fine"}""" + "\nnot json at all\n")
    val (g2, r2) = Ingest.readJson(spark, s"$dir/bad.json", schema)
    assert(g2.count() == 1 && r2.count() == 1)
  }

  test("layout-policy writer partitions directories and keeps data") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/t"
    val df = Seq((1L, "2024-01-01", "b1"), (2L, "2024-01-02", "b2"))
      .toDF("id", "day", "bike")
    Ingest.writePartitioned(df, dir, Seq("day"), Seq("bike"), files = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2)
    assert(Files.list(java.nio.file.Paths.get(dir)).toArray
      .map(_.toString).exists(_.contains("day=2024-01-01")))
  }

  test("DSv2 synth source: id-range filters absorbed at planning " +
       "time, columns pruned to the projection, rows bit-identical " +
       "to the JVM generator formulas") {
    import org.apache.spark.sql.functions._
    import graft.sources.v2.{SynthEvents, SynthScan}
    val df = spark.read
      .format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "1000").load()
      .filter(col("event_id") >= 200L && col("event_id") < 700L)
      .select("event_id", "event_type", "value_e2")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan
    }
    assert(scans.nonEmpty)
    val sc = scans.head.asInstanceOf[SynthScan]
    assert(sc.lo == 200L && sc.hi == 700L,
      s"range not pushed: [${sc.lo}, ${sc.hi})")
    assert(sc.required.fieldNames.toSet ==
      Set("event_id", "event_type", "value_e2"), "columns not pruned")
    assert(df.count() == 500)
    // rows match the JVM formulas (the same ones the oracle mirrors)
    val got = df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got.head == ((200L, SynthEvents.eventType(200L),
      SynthEvents.valueE2(200L))))
    assert(got.forall { case (i, t, v) =>
      t == SynthEvents.eventType(i) && v == SynthEvents.valueE2(i) })
    // and the JVM hash60 is bit-identical to the Spark column hash
    val probe = spark.range(5).select(
      graft.functions.PortableHash.hash60(
        concat(lit("v2e:"), col("id"))).as("h"))
      .collect().map(_.getLong(0)).toSeq
    assert(probe == (0L until 5L).map(i => SynthEvents.hash60(s"v2e:$i")))
  }

  test("DSv2 runtime filtering: an IN(event_id) predicate narrows " +
       "the scan to exact-id partitions (no non-matching row is " +
       "generated); out-of-range ids drop; a disjoint set plans " +
       "zero rows") {
    import org.apache.spark.sql.connector.{expressions => v2e}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import graft.sources.v2.{SynthIdsPartition, SynthScan, SynthScanBuilder}
    def inPred(ids: Seq[Long]) = new Predicate("IN",
      (v2e.Expressions.column("event_id") +:
        ids.map(v => v2e.Expressions.literal(v)
          : v2e.Expression)).toArray)
    val scan = new SynthScanBuilder(1000L, 10L, 4).build()
      .asInstanceOf[SynthScan]
    scan.filter(Array(inPred(Seq(7L, 3L, 999L, 1000L, 2000L, 3L))))
    val parts = scan.planInputPartitions()
    assert(parts.forall(_.isInstanceOf[SynthIdsPartition]))
    val planned = parts.flatMap(_.asInstanceOf[SynthIdsPartition].ids)
    // 1000/2000 are outside [0,1000); duplicates collapse; sorted hull
    assert(planned.sorted.toSeq == Seq(3L, 7L, 999L))
    val rf = scan.createReaderFactory()
    val got = parts.flatMap { p =>
      val r = rf.createReader(p)
      Iterator.continually(r).takeWhile(_.next()).map(_.get().getLong(0))
        .toArray
    }
    assert(got.sorted.toSeq == Seq(3L, 7L, 999L))
    val scan2 = new SynthScanBuilder(1000L, 10L, 4).build()
      .asInstanceOf[SynthScan]
    scan2.filter(Array(inPred(Seq(5000L, 6000L))))
    assert(scan2.planInputPartitions().isEmpty ||
      scan2.planInputPartitions().forall {
        case SynthIdsPartition(ids) => ids.isEmpty
        case graft.sources.v2.SynthPartition(s, e) => e <= s
      })
  }

  test("DSv2 aggregate pushdown: COUNT/MIN/MAX collapse at the " +
       "source (closed form over the filtered range); empty range " +
       "gives 0/NULL/NULL; supported groupings push PARTIALLY and " +
       "unsupported aggregates are declined") {
    import org.apache.spark.sql.functions._
    def src = spark.read
      .format("graft.sources.v2.SynthEventsProvider")
      .option("rows", "1000").load()
    val agg = src.filter(col("event_id") >= 100L && col("event_id") < 900L)
      .agg(count(lit(1)).as("n"), min("event_id").as("mn"),
        max("event_id").as("mx"))
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates"), p)
    assert(!p.contains("HashAggregate"), p)
    val r = agg.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((800L, 100L, 899L)))
    // empty surviving range: COUNT 0, MIN/MAX NULL — SQL semantics
    val e = src.filter(col("event_id") >= 5000L)
      .agg(count(lit(1)).as("n"), min("event_id").as("mn")).collect()(0)
    assert(e.getLong(0) == 0L && e.isNullAt(1))
    // a supported grouping pushes PARTIALLY: the scan reports
    // PushedGroupBy, the finalize HashAggregate stays on top, and the
    // finalized counts still total the row count
    val g = src.groupBy("event_type").agg(count(lit(1)).as("n"))
    val gp = g.queryExecution.executedPlan.toString
    assert(gp.contains("PushedGroupBy [event_type]"), gp)
    assert(gp.contains("mode=partial"), gp)
    assert(gp.contains("HashAggregate"), gp)
    assert(g.agg(sum("n")).collect()(0).getLong(0) == 1000L)
    // an UNSUPPORTED grouping (non-generator column ts_l) is declined
    // entirely and Spark aggregates the generated rows itself
    val u = src.groupBy("ts_l").agg(count(lit(1)).as("n"))
    val up = u.queryExecution.executedPlan.toString
    assert(!up.contains("PushedAggregates"), up)
    assert(u.agg(sum("n")).collect()(0).getLong(0) == 1000L)
    // COUNT(DISTINCT …) must not be claimed either
    val d = src.agg(countDistinct("event_type").as("n"))
    assert(!d.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(d.collect()(0).getLong(0) == 5L)
    // grouped SUM over event_id pushes partially and finalizes right:
    // per-group id sums must total the closed-form range sum
    val sg = src.groupBy("user_id", "event_type")
      .agg(sum("event_id").as("s"))
    val sp = sg.queryExecution.executedPlan.toString
    assert(sp.contains("PushedGroupBy [user_id, event_type]"), sp)
    assert(sg.agg(sum("s")).collect()(0).getLong(0) == 999L * 1000L / 2L)
  }
}
