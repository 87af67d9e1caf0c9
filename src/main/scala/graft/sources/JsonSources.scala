package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source adapters for the reference's three API payload shapes
  * (S1–S3 in SURVEY.md §2.1), as schema-enforced `from_json`
  * flatteners.
  *
  * The reference fetches these over HTTP driver-side
  * (`lambda/bike_lambda.py:52-59`, `weather_lambda.py:55-75`,
  * `air_lambda.py:34-64`); fetching is an orchestration concern, so
  * the engine's contract starts at "a DataFrame with one raw JSON
  * document per row" and produces typed relational rows. All nested
  * access is null-tolerant (P2: absent `iaqi.t.v` paths become nulls,
  * mirroring the `.get()` chains at `air_lambda.py:55-61`).
  *
  * Malformed documents are not dropped silently: [[withRejects]]
  * splits a parsed frame into (good, rejects) — the reference's
  * `failed_cities` pattern (`weather_lambda.py:147-149`) generalized.
  */
object JsonSources {

  // --- GBFS free_bike_status (`bike_lambda.py:58,62-71`) -------------
  val gbfsSchema: StructType = StructType(Seq(
    StructField("data", StructType(Seq(
      StructField("bikes", ArrayType(StructType(Seq(
        StructField("bike_id", StringType),
        StructField("provider_id", StringType),
        StructField("lat", DoubleType),
        StructField("lon", DoubleType),
        StructField("is_reserved", BooleanType),
        StructField("is_disabled", BooleanType))))))))))

  /** One row per bike; `batchTs` is the single driver-side ingest
    * timestamp the reference stamps per batch (`bike_lambda.py:62`) —
    * a literal, NOT per-row current_timestamp(), for determinism. */
  def parseGbfs(raw: DataFrame, jsonCol: String,
                batchTs: java.sql.Timestamp): DataFrame =
    raw.select(from_json(col(jsonCol), gbfsSchema).as("j"))
      .select(explode(col("j.data.bikes")).as("b"))
      .select(col("b.bike_id"), col("b.provider_id"),
        col("b.lat"), col("b.lon"),
        col("b.is_reserved"), col("b.is_disabled"),
        lit(batchTs).as("timestamp"))

  // --- WAQI air quality (`air_lambda.py:53-61`) ----------------------
  val waqiSchema: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("data", StructType(Seq(
      StructField("aqi", IntegerType),
      StructField("iaqi", StructType(Seq(
        StructField("t", StructType(Seq(StructField("v", DoubleType)))),
        StructField("h", StructType(Seq(StructField("v", DoubleType)))),
        StructField("pm25", StructType(Seq(StructField("v", DoubleType))))))))))))

  /** One row per document; absent iaqi fields → null (the reference's
    * `.get('t', {}).get('v')`). */
  def parseWaqi(raw: DataFrame, cityCol: String, jsonCol: String): DataFrame =
    raw.select(col(cityCol).as("city"),
        from_json(col(jsonCol), waqiSchema).as("j"))
      .select(col("city"),
        col("j.data.aqi").as("aqi"),
        col("j.data.iaqi.t.v").as("temperature"),
        col("j.data.iaqi.h.v").as("humidity"),
        col("j.data.iaqi.pm25.v").as("pm25"))

  // --- OpenWeather current weather (`weather_lambda.py:92-93`) -------
  val openWeatherSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("main", StructType(Seq(
      StructField("temp", DoubleType),
      StructField("humidity", IntegerType)))),
    StructField("weather", ArrayType(StructType(Seq(
      StructField("description", StringType))))),
    StructField("wind", StructType(Seq(StructField("speed", DoubleType))))))

  // --- OpenWeather air_pollution (`weather_lambda.py:91-94`) ---------
  val airPollutionSchema: StructType = StructType(Seq(
    StructField("list", ArrayType(StructType(Seq(
      StructField("main", StructType(Seq(StructField("aqi", IntegerType)))),
      StructField("components", StructType(Seq(
        StructField("pm2_5", DoubleType))))))))))

  /** Joined weather + pollution per city, the 7-column row the
    * reference inserts (`weather_lambda.py:77-96`); empty `list` →
    * null aqi/pm25 (the `if len(list) else None` guard). */
  def parseWeather(raw: DataFrame, cityCol: String, weatherCol: String,
                   pollutionCol: String, batchTs: java.sql.Timestamp): DataFrame =
    raw.select(col(cityCol).as("city"),
        from_json(col(weatherCol), openWeatherSchema).as("w"),
        from_json(col(pollutionCol), airPollutionSchema).as("p"))
      .select(col("city"),
        // try_element_at: Spark 4 ANSI mode makes element_at throw on
        // an empty list; the reference's `if len(list) else None`
        // guard maps to the try_ variant
        try_element_at(col("p.list"), lit(1)).getField("main")
          .getField("aqi").as("aqi"),
        col("w.main.temp").as("temperature"),
        col("w.main.humidity").as("humidity"),
        try_element_at(col("p.list"), lit(1)).getField("components")
          .getField("pm2_5").as("pm25"),
        lit(batchTs).as("timestamp"))

  /** Split a raw frame into (parsed-good, rejects). A document is a
    * reject when `from_json` yields null (malformed) or `requiredCol`
    * is null after parsing. Rejects keep the raw document for triage. */
  def withRejects(raw: DataFrame, jsonCol: String, schema: StructType,
                  requiredPath: String): (DataFrame, DataFrame) = {
    val parsed = raw.withColumn("__parsed", from_json(col(jsonCol), schema))
    val ok = col("__parsed").isNotNull &&
      col(s"__parsed.$requiredPath").isNotNull
    (parsed.filter(ok), parsed.filter(!ok).drop("__parsed"))
  }
}
