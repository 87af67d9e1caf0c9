package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.MergeByKey
import Exact._

/** Pipeline-operator queries: keyed upsert (M1) and multimodal binary
  * plumbing, both oracle-checked.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q31 — mergeByKey upsert (`trips_lambda.py:180-206`): a target
  // extract, an overlapping updates batch (10% price bump, status
  // 'U'), merged on the natural key; updates win. Verified through an
  // aggregate so the result is stable and small.
  // ---------------------------------------------------------------------
  private def q31(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val target = o.filter(col("o_orderdate") < to_timestamp(lit("1997-07-01")))
    val updates = o
      .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        lit("U").as("o_orderstatus"),
        // +1000.0 not *1.1: a product needs re-rounding, and Spark's
        // BigDecimal HALF_UP differs from DuckDB's double rounding on
        // boundary values; addition keeps 2-decimal values exact.
        (col("o_totalprice") + 1000.0).as("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    MergeByKey.merge(target, updates, Seq("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        fixedSum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  private val q31Sql =
    s"""WITH target AS (
       |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |         o_orderdate, o_orderpriority, 0 AS prio
       |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
       |updates AS (
       |  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
       |         o_totalprice + 1000.0 AS o_totalprice,
       |         o_orderdate, o_orderpriority, 1 AS prio
       |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
       |    AND o_orderdate < TIMESTAMP '1998-01-01'),
       |merged AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY o_orderkey
       |      ORDER BY prio DESC) AS rn
       |    FROM (SELECT * FROM target UNION ALL SELECT * FROM updates))
       |  WHERE rn = 1)
       |SELECT o_orderstatus, count(*) AS n,
       |  count(DISTINCT o_orderkey) AS n_keys,
       |  ${fixedSumSql("o_totalprice")} AS total
       |FROM merged
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q32 — multimodal binary plumbing: opaque bytes + typed metadata
  // (kind), byte length, hex signature; aggregated per (kind, lang).
  // The decode stage itself is exercised in the Multimodal specs (its
  // stub hashing is not SQL-expressible).
  // ---------------------------------------------------------------------
  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.operators.Multimodal.kindFor(col("doc_id")).as("kind"),
        encode(col("text"), "UTF-8").as("content"))
      .select(col("doc_id"), col("lang"), col("kind"),
        length(col("content")).cast("long").as("n_bytes"),
        substring(hex(col("content")), 1, 16).as("sig_hex"))
      .groupBy(col("kind"), col("lang"))
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("sig_hex")).as("min_sig"))
      .orderBy(col("kind"), col("lang"))

  private val q32Sql =
    """WITH media AS (
      |  SELECT doc_id, lang,
      |    (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    substr(upper(hex(encode(text))), 1, 16) AS sig_hex
      |  FROM documents)
      |SELECT kind, lang, count(*) AS n_media,
      |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
      |  min(sig_hex) AS min_sig
      |FROM media
      |GROUP BY kind, lang
      |ORDER BY kind, lang""".stripMargin

  // ---------------------------------------------------------------------
  // q89 — REAL media decode in the gate: a RIFF/WAVE PCM16 blob per
  // document (closed-form waveform, see Multimodal.syntheticWav) is
  // byte-encoded, then parsed back by the chunk-walking WAV decoder
  // in a mapPartitions batch, extracting integer-exact features
  // (peak, zero crossings, energy). The oracle recomputes every
  // feature analytically from the waveform's closed form WITHOUT
  // parsing a byte — if header layout, chunk walking, or PCM16
  // little-endian decoding were wrong anywhere, the features would
  // not match. This replaces "decode is stubbed" for the one media
  // container that needs no external codec library.
  // ---------------------------------------------------------------------
  private def q89(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.decodeWav(
        graft.operators.Multimodal.syntheticWav(t(s, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"))

  private val q89Sql =
    """WITH d AS (
      |  SELECT doc_id, 160 + (doc_id % 23) * 8 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
      |v AS (
      |  SELECT doc_id, n, i,
      |    ((doc_id * 31 + i * 37) % 2003) - 1001 AS v,
      |    ((doc_id * 31 + (i - 1) * 37) % 2003) - 1001 AS vp
      |  FROM s)
      |SELECT doc_id AS media_id,
      |  CAST(8000 AS BIGINT) AS sample_rate,
      |  CAST(max(n) AS BIGINT) AS n_samples,
      |  CAST(max(abs(v)) AS BIGINT) AS peak,
      |  CAST(sum(CASE WHEN i > 0 AND v * vp < 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_zero_cross,
      |  CAST(sum(v * v) AS BIGINT) AS energy
      |FROM v
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q132 — REAL image decode in the gate: a 24bpp BMP per document
  // (closed-form gradient, see Multimodal.syntheticBmp) is
  // byte-encoded — bottom-up BGR rows, 4-byte stride padding, the
  // parts implementations get wrong — then parsed back by the
  // validating BMP decoder in a mapPartitions batch. Features are
  // integer-exact channel sums plus a per-PIXEL max luma (not
  // derivable from sums: proves every pixel was visited). The oracle
  // recomputes all of it from the gradient's closed form without
  // parsing a byte — q89's discipline extended to the image
  // modality.
  // ---------------------------------------------------------------------
  private def q132(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.decodeBmp(
        graft.operators.Multimodal.syntheticBmp(t(s, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"))

  private val q132Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 7 + 3 * x + 5 * y) % 256 AS r,
      |    (doc_id * 11 + 13 * x + 17 * y) % 256 AS g,
      |    (doc_id * 19 + 23 * x + 29 * y) % 256 AS b
      |  FROM px)
      |SELECT doc_id AS media_id,
      |  CAST(max(w) AS INTEGER) AS width,
      |  CAST(max(h) AS INTEGER) AS height,
      |  CAST(sum(r) AS BIGINT) AS r_sum,
      |  CAST(sum(g) AS BIGINT) AS g_sum,
      |  CAST(sum(b) AS BIGINT) AS b_sum,
      |  CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS lum_max
      |FROM v
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q182 — image RESIZE in the gate (multimodal transform leg):
  // every synthetic gradient BMP is decoded, nearest-neighbor
  // downsampled ×2 (output (x,y) samples source (2x,2y)), re-encoded
  // as a real BMP — fresh header, stride, bottom-up rows — and
  // decoded AGAIN for features. The oracle computes the resized
  // image's channel sums and max luma from the gradient's closed
  // form at the sampled coordinates without parsing a byte: if the
  // resampling grid, orientation handling, or either codec pass were
  // wrong anywhere, the sums would not match.
  // ---------------------------------------------------------------------
  // ---------------------------------------------------------------------
  // q206 — frame-level audio features (the granularity VAD / energy
  // gating actually trains on): every synthetic WAV decodes through
  // the real RIFF parser, then emits per-40-sample-frame peak, strict
  // zero crossings (within-frame pairs only) and Σs² energy. The
  // oracle recomputes each frame from the waveform's closed form —
  // frame boundaries, the short final frame, and the boundary-pair
  // exclusion all have to match exactly.
  // ---------------------------------------------------------------------
  private def q206(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.wavFrameFeatures(
        Multimodal.syntheticWav(t(s, dir, "documents")), 40)
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))
  }

  private val q206Sql =
    """WITH d AS (
      |  SELECT doc_id, 160 + (doc_id % 23) * 8 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
      |v AS (
      |  SELECT doc_id, i, i // 40 AS frame_idx,
      |    ((doc_id * 31 + i * 37) % 2003) - 1001 AS v,
      |    ((doc_id * 31 + (i - 1) * 37) % 2003) - 1001 AS vp
      |  FROM s)
      |SELECT doc_id AS media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  count(*) AS n,
      |  CAST(max(abs(v)) AS BIGINT) AS peak,
      |  CAST(sum(CASE WHEN i % 40 > 0 AND v * vp < 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_zero_cross,
      |  CAST(sum(v * v) AS BIGINT) AS energy
      |FROM v
      |GROUP BY 1, 2
      |ORDER BY media_id, frame_idx""".stripMargin

  // ---------------------------------------------------------------------
  // q207 — per-image luma histogram (the exposure-profile feature an
  // image-curation pipeline filters on): every gradient BMP decodes
  // through the real parser and bins its pixels by integer Rec. 709
  // luma into 8 equal-width bins; only occupied bins emit. The oracle
  // rebuilds the histogram from the gradient closed form — binning
  // arithmetic and sparse-emission semantics must match bit-for-bit.
  // ---------------------------------------------------------------------
  private def q207(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.bmpLumaHistogram(
        Multimodal.syntheticBmp(t(s, dir, "documents")), 8)
      .toDF()
      .orderBy(col("media_id"), col("bin"))
  }

  private val q207Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |v AS (
      |  SELECT doc_id,
      |    (doc_id * 7 + 3 * x + 5 * y) % 256 AS r,
      |    (doc_id * 11 + 13 * x + 17 * y) % 256 AS g,
      |    (doc_id * 19 + 23 * x + 29 * y) % 256 AS b
      |  FROM px)
      |SELECT doc_id AS media_id,
      |  (2126 * r + 7152 * g + 722 * b) * 8 // 2550001 AS bin,
      |  count(*) AS n_px
      |FROM v
      |GROUP BY 1, 2
      |ORDER BY media_id, bin""".stripMargin

  private def q182(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Multimodal
    Multimodal.decodeBmp(Multimodal.resizeBmp(
        Multimodal.syntheticBmp(t(s, dir, "documents")), 2))
      .toDF()
      .orderBy(col("media_id"))
  }

  private val q182Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
      |  FROM documents),
      |dims AS (
      |  SELECT doc_id, (w + 1) // 2 AS w2, (h + 1) // 2 AS h2 FROM d),
      |xs AS (SELECT doc_id, w2, h2, unnest(range(0, w2)) AS x FROM dims),
      |px AS (SELECT doc_id, w2, h2, x, unnest(range(0, h2)) AS y FROM xs),
      |v AS (
      |  SELECT doc_id, w2, h2,
      |    (doc_id * 7 + 3 * (2 * x) + 5 * (2 * y)) % 256 AS r,
      |    (doc_id * 11 + 13 * (2 * x) + 17 * (2 * y)) % 256 AS g,
      |    (doc_id * 19 + 23 * (2 * x) + 29 * (2 * y)) % 256 AS b
      |  FROM px)
      |SELECT doc_id AS media_id,
      |  CAST(max(w2) AS INTEGER) AS width,
      |  CAST(max(h2) AS INTEGER) AS height,
      |  CAST(sum(r) AS BIGINT) AS r_sum,
      |  CAST(sum(g) AS BIGINT) AS g_sum,
      |  CAST(sum(b) AS BIGINT) AS b_sum,
      |  CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS lum_max
      |FROM v
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q96 — frame sampling in the gate: every 2nd 64-byte window of
  // each media blob becomes a row (the video-demux fan-out shape,
  // Multimodal.sampleFrames), aggregated back per media. The oracle
  // recomputes frame counts, the last sampled index, and total
  // sampled bytes from octet_length alone — closed-form, no byte
  // parsing — so the distributed flatMap slicer is gate-checked.
  // ---------------------------------------------------------------------
  private def q96(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.sampleFrames(
        graft.operators.Multimodal.syntheticMedia(t(s, dir, "documents")),
        everyN = 2, frameBytes = 64)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("frame_no")).cast("long").as("last_frame"),
        sum(length(col("frame_bytes"))).as("sampled_bytes"))
      .orderBy(col("media_id"))

  private val q96Sql =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
      |    (CAST(octet_length(encode(text)) AS BIGINT) + 63) // 64
      |      AS windows
      |  FROM documents),
      |f AS (
      |  SELECT media_id, nb, windows,
      |    (windows + 1) // 2 AS n_frames
      |  FROM m)
      |SELECT media_id,
      |  CAST(n_frames AS BIGINT) AS n_frames,
      |  CAST(2 * (n_frames - 1) AS BIGINT) AS last_frame,
      |  CAST(64 * (n_frames - 1) +
      |    CASE WHEN windows % 2 = 1 THEN nb - 64 * (windows - 1)
      |         ELSE 64 END AS BIGINT) AS sampled_bytes
      |FROM f
      |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------------
  // q56 — SCD Type-2 dimension merge: a synthetic "day 2" snapshot of
  // customer (every key ending in 3 moves its balance; keys ending in
  // 4 re-arrive unchanged; a shifted-key cohort is brand new) applied
  // to a freshly-initialized versioned dimension. The gate checks the
  // full versioned table: closed rows keep their original validity
  // start and close at the effective date, unchanged keys stay open
  // and untouched, new keys open at the effective date.
  // ---------------------------------------------------------------------
  private def q56(s: SparkSession, dir: String): DataFrame =
    scd2Versioned(s, dir).orderBy(col("c_custkey"), col("valid_from"))

  private def scd2Versioned(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeByKey
    val c = Tables.load(s, dir, "customer")
    val current = c.select(col("c_custkey"), col("c_mktsegment"),
        col("c_acctbal"))
      .withColumn("valid_from", lit("2000-01-01").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val updates =
      c.filter(col("c_custkey") % 10 === 3 || col("c_custkey") % 10 === 4)
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("c_custkey") % 10 === 3, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .unionByName(c.filter(col("c_custkey") % 100 === 7)
          .select((col("c_custkey") + 10000000L).as("c_custkey"),
            col("c_mktsegment"), col("c_acctbal")))
    MergeByKey.scd2(current, updates, Seq("c_custkey"),
        Seq("c_mktsegment", "c_acctbal"),
        effective = lit("2005-06-15").cast("timestamp"))
  }

  private val scd2Body =
    """cur AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    TIMESTAMP '2000-01-01' AS valid_from,
      |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS c_acctbal
      |  FROM customer WHERE c_custkey % 10 IN (3, 4)
      |  UNION ALL
      |  SELECT c_custkey + 10000000, c_mktsegment, c_acctbal
      |  FROM customer WHERE c_custkey % 100 = 7),
      |changed AS (
      |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal, c.valid_from
      |  FROM upd u JOIN cur c USING (c_custkey)
      |  WHERE u.c_acctbal IS DISTINCT FROM c.c_acctbal
      |     OR u.c_mktsegment IS DISTINCT FROM c.c_mktsegment),
      |closed AS (
      |  SELECT c.c_custkey, c.c_mktsegment, c.c_acctbal, c.valid_from,
      |    TIMESTAMP '2005-06-15' AS valid_to, false AS is_current
      |  FROM cur c JOIN changed ch USING (c_custkey)),
      |kept AS (
      |  SELECT c.* FROM cur c LEFT JOIN changed ch USING (c_custkey)
      |  WHERE ch.c_custkey IS NULL),
      |fresh AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    TIMESTAMP '2005-06-15' AS valid_from,
      |    CAST(NULL AS TIMESTAMP) AS valid_to, true AS is_current
      |  FROM changed
      |  UNION ALL
      |  SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
      |    TIMESTAMP '2005-06-15', NULL, true
      |  FROM upd u LEFT JOIN cur c USING (c_custkey)
      |  WHERE c.c_custkey IS NULL)
      |,scd AS (
      |  SELECT * FROM closed
      |  UNION ALL SELECT * FROM kept
      |  UNION ALL SELECT * FROM fresh)""".stripMargin

  private val q56Sql =
    s"""WITH $scd2Body
       |SELECT * FROM scd
       |ORDER BY c_custkey, valid_from""".stripMargin

  // ---------------------------------------------------------------------
  // q75 — SCD2 time-travel: reconstruct the dimension as of an
  // instant from the versioned table q56 builds. Snapshot at the
  // merge's effective date = the post-merge current state (closed
  // rows fall out via the half-open [from, to) validity; rows opened
  // at that instant are in). One prunable filter over the versioned
  // table — history depth is free.
  // ---------------------------------------------------------------------
  private def q75(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeByKey
    MergeByKey.snapshotAt(scd2Versioned(s, dir),
        lit("2005-06-15").cast("timestamp"))
      .orderBy(col("c_custkey"))
  }

  private val q75Sql =
    s"""WITH $scd2Body
       |SELECT * FROM scd
       |WHERE valid_from <= TIMESTAMP '2005-06-15'
       |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2005-06-15')
       |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q60 — incremental recomputation (the reference's operating model:
  // a daily job reprocesses a trailing window and upserts,
  // `trips_lambda.py:218-221` + ON CONFLICT): two OVERLAPPING
  // day-aligned incremental runs merged by key must equal one full
  // recompute — the oracle IS the full recompute, so the gate proves
  // the incremental path converges to batch truth. Day alignment is
  // the load-bearing detail: a window cutting a day in half would
  // upsert a partial aggregate; re-deriving whole days makes the
  // merge idempotent (why the reference reprocesses full 24 h).
  // ---------------------------------------------------------------------
  private def q60(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeByKey
    val e = Tables.eventsSec(s, dir)
    def dailyAgg(df: DataFrame): DataFrame = df
      .groupBy(col("user_id"), to_date(col("ts_s")).as("day"))
      .agg(count(lit(1)).as("n_events"),
        fixedSum(col("value")).as("value_total"))
    val run1 = dailyAgg(
      e.filter(col("ts_s") < lit("2024-01-16").cast("timestamp")))
    val run2 = dailyAgg(
      e.filter(col("ts_s") >= lit("2024-01-14").cast("timestamp")))
    MergeByKey.merge(run1, run2, Seq("user_id", "day"))
      .orderBy(col("user_id"), col("day"))
  }

  private val q60Sql =
    s"""SELECT user_id,
       |  CAST(date_trunc('day', ts) AS DATE) AS day,
       |  count(*) AS n_events,
       |  ${Exact.fixedSumSql("value")} AS value_total
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY user_id, day""".stripMargin

  // ---------------------------------------------------------------------
  // q111 — CDC changelog application (the replication consumer):
  // orders is split into a base snapshot (keys %3 ∉ {0}) and a
  // deterministic changelog — inserts (%3=0), updates (+111 at seq 1
  // for %3=1), deletes (%3=2), and a second-generation update (+222
  // at seq 2 for %9=1) that must override the first by LATEST-WINS
  // sequencing. The changelog collapses via max_by (map-side
  // combinable — no window sort over the change stream), then
  // anti-join + union applies it. Oracle: the closed-form CASE over
  // the source table.
  // ---------------------------------------------------------------------
  private def q111(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.MergeByKey
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      round(col("o_totalprice") * 100).cast("long").as("price_e2"))
    val base = o.filter(col("o_orderkey") % 3 =!= 0)
    def ch(flt: org.apache.spark.sql.Column, price: org.apache.spark.sql.Column,
           op: String, seq: Long) =
      o.filter(flt).select(col("o_orderkey"), price.as("price_e2"),
        lit(op).as("op"), lit(seq).as("seq"))
    val changes =
      ch(col("o_orderkey") % 3 === 0, col("price_e2"), "I", 1L)
        .unionByName(ch(col("o_orderkey") % 3 === 1,
          col("price_e2") + 111L, "U", 1L))
        .unionByName(ch(col("o_orderkey") % 3 === 2, lit(0L), "D", 1L))
        .unionByName(ch(col("o_orderkey") % 9 === 1,
          col("price_e2") + 222L, "U", 2L))
    MergeByKey.applyChangeLog(base, changes, Seq("o_orderkey"),
        "op", "seq")
      .orderBy(col("o_orderkey"))
  }

  private val q111Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 9 = 1
      |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 222
      |       WHEN o_orderkey % 3 = 1
      |         THEN CAST(round(o_totalprice * 100) AS BIGINT) + 111
      |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
      |    AS price_e2
      |FROM orders
      |WHERE o_orderkey % 3 != 2
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------------------------------
  // q142 — the reference's HEADLINE capability end-to-end (`/root/
  // reference/README.md:1-3,80-83`): the composed mobility pipeline
  // ingest → trip derivation → spatial enrichment → weather as-of →
  // idempotent upsert → carbon-savings rollup, every stage the actual
  // library operator (Trips.deriveTripsExact, Spatial.enrich's grid
  // index, AsOfJoin.lastBefore, MobilityPipeline.upsert/mergeWrite,
  // MobilityPipeline.carbonSavings verbatim). Events play bike
  // snapshots (user≈bike, per-row IEEE coordinate derivation — the
  // q50/q64 parity); 'error' events play weather observations keyed
  // by synthetic city names matching the municipality grid. The
  // upsert runs TWICE with the same window — the reference's daily
  // re-derivation — so the gate also proves merge idempotence: the
  // oracle computes the chain once. Distances are e4-integer by the
  // deriveTripsExact discipline, so carbonSavings' float sum runs
  // over integer-valued doubles (exact in any order) and its
  // kg_co2 = sum·0.12 is ONE IEEE multiply over an exact integer —
  // bit-identical on both engines.
  // ---------------------------------------------------------------------
  private def q142(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{MobilityPipeline, Spatial}
    val e = Tables.eventsSec(s, dir)
    val snapshots = e.select(
      concat(lit("b"), col("user_id")).as("bike_id"),
      concat(lit("p"), col("user_id") % 3).as("provider_id"),
      (abs(col("value") * 13.7) % 90).as("lat"),
      ((col("event_id").cast("double") * 3.3) % 180).as("lon"),
      col("event_id").as("snap_id"),
      (col("ts_s") + expr("INTERVAL 1 HOUR")).as("local_ts"))
    val weather = e.filter(col("event_type") === "error")
      .groupBy(
        concat(lit("m_"), expr("user_id % 10"), lit("_"),
          expr("user_id div 10 % 10")).as("city"),
        col("ts_s").as("obs_time"))
      .agg(max(col("value")).as("temperature"))
    val wStart = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val wEnd = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // gap band widened to [60 s, 24 h] and trip cap to 30 days — the
    // q15 adjustment: driver events are sparser than bike pings
    val params = graft.operators.TripParams(minGapSeconds = 60,
      maxGapSeconds = 86400, minTripMinutes = 1, maxTripMinutes = 43200,
      minSegments = 2)
    val enriched = MobilityPipeline.enrichedTripsExact(snapshots, weather,
      Spatial.SyntheticMunicipalities, wStart, wEnd, params)
    val path = java.nio.file.Files.createTempDirectory("graft_q142")
      .toString + "/all_trips"
    MobilityPipeline.upsert(s, path, enriched, wStart, wEnd)
    // the daily re-run: same window, same derivation — must be a no-op
    MobilityPipeline.upsert(s, path, enriched, wStart, wEnd)
    val allTrips = s.read.parquet(path)
    val carbon = MobilityPipeline.carbonSavings(
      allTrips.withColumn("total_distance",
        col("total_distance_e4").cast("double")))
    val wx = allTrips.groupBy(col("municipality"))
      .agg(max(col("temperature")).as("max_temp"),
        sum(col("temperature").isNotNull.cast("long")).as("n_with_weather"))
    carbon.join(wx, Seq("municipality"))
      .select(col("municipality"), col("n_trips"),
        col("total_km").cast("long").as("total_km_e4"),
        col("kg_co2_saved").as("kg_co2_saved_e4kg"),
        col("max_temp"), col("n_with_weather"))
      .orderBy(col("municipality"))
  }

  private val q142Sql = {
    import graft.operators.Spatial
    val hav = graft.functions.Geo.haversineKmSql(
      "prev_lat", "prev_lon", "lat", "lon")
    val muniCase = Spatial.SyntheticMunicipalities.map(m =>
      s"WHEN ${Spatial.insideSql(m, "start_lat", "start_lon")} " +
        s"THEN '${m.name}'")
      .mkString("CASE ", " ", " ELSE 'none' END")
    s"""WITH snaps AS (
       |  SELECT 'b' || CAST(user_id AS VARCHAR) AS bike_id,
       |    'p' || CAST(user_id % 3 AS VARCHAR) AS provider_id,
       |    fmod(abs(value * 13.7), 90) AS lat,
       |    fmod(CAST(event_id AS DOUBLE) * 3.3, 180) AS lon,
       |    event_id AS snap_id,
       |    ${Exact.secSql("ts")} + INTERVAL 1 HOUR AS local_ts
       |  FROM events),
       |filtered AS (
       |  SELECT * FROM snaps
       |  WHERE local_ts >= TIMESTAMP '2024-01-01 00:00:00'
       |    AND local_ts < TIMESTAMP '2026-01-01 00:00:00'),
       |moves AS (
       |  SELECT bike_id, provider_id, lat, lon, local_ts,
       |    lag(local_ts) OVER w AS prev_ts,
       |    lag(lat) OVER w AS prev_lat,
       |    lag(lon) OVER w AS prev_lon
       |  FROM filtered
       |  WINDOW w AS (PARTITION BY bike_id ORDER BY local_ts, snap_id)),
       |segments AS (
       |  SELECT bike_id, provider_id,
       |    prev_ts AS start_ts, local_ts AS end_ts,
       |    prev_lat AS s_lat, prev_lon AS s_lon,
       |    CAST(epoch(local_ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT)
       |      AS gap_s,
       |    CAST(round(($hav) * 10000) AS BIGINT) AS dist_e4
       |  FROM moves
       |  WHERE prev_ts IS NOT NULL
       |    AND CAST(epoch(local_ts) AS BIGINT) -
       |        CAST(epoch(prev_ts) AS BIGINT) BETWEEN 60 AND 86400
       |    AND (prev_lat != lat OR prev_lon != lon)),
       |trips AS (
       |  SELECT bike_id, provider_id,
       |    min(start_ts) AS trip_start,
       |    min(s_lat) AS start_lat, min(s_lon) AS start_lon,
       |    CAST(sum(dist_e4) AS BIGINT) AS total_distance_e4
       |  FROM segments
       |  GROUP BY bike_id, provider_id
       |  HAVING CAST(sum(gap_s) AS BIGINT) BETWEEN 60 AND 2592000
       |    AND CAST(sum(dist_e4) AS BIGINT) > 0 AND count(*) >= 2),
       |classified AS (
       |  SELECT bike_id, trip_start, total_distance_e4,
       |    $muniCase AS municipality
       |  FROM trips),
       |weather AS (
       |  SELECT 'm_' || CAST(user_id % 10 AS VARCHAR) || '_' ||
       |      CAST((user_id // 10) % 10 AS VARCHAR) AS city,
       |    ${Exact.secSql("ts")} AS obs_time,
       |    max(value) AS temperature
       |  FROM events WHERE event_type = 'error'
       |  GROUP BY 1, 2),
       |enriched AS (
       |  SELECT t.municipality, t.total_distance_e4,
       |    (SELECT w.temperature FROM weather w
       |     WHERE w.city = t.municipality AND w.obs_time <= t.trip_start
       |     ORDER BY w.obs_time DESC LIMIT 1) AS temperature
       |  FROM classified t)
       |SELECT municipality, count(*) AS n_trips,
       |  CAST(sum(total_distance_e4) AS BIGINT) AS total_km_e4,
       |  CAST(CAST(sum(total_distance_e4) AS BIGINT) AS DOUBLE) *
       |    CAST(0.12 AS DOUBLE) AS kg_co2_saved_e4kg,
       |  max(temperature) AS max_temp,
       |  CAST(sum(CASE WHEN temperature IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_with_weather
       |FROM enriched
       |GROUP BY municipality
       |ORDER BY municipality""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q171 — the STREAMING trip derivation in the gate: bike snapshots
  // (the q142 derivation from events) replayed through the
  // `flatMapGroupsWithState` fold (`streaming/StatefulTrips.scala`,
  // the streaming twin of `lambda/trips_lambda.py:94-163`), flushed
  // by per-bike sentinel rows, drained AvailableNow to parquet. The
  // oracle mirrors the fold's exact session semantics in SQL: gap >
  // maxGap splits sessions (gaps-and-islands), a segment is valid iff
  // gap ∈ [minGap, maxGap] AND the position moved, the trip start
  // anchors at the FIRST valid segment's predecessor snapshot, the
  // trip end is the session's LAST snapshot (even if its closing
  // segment was invalid — the stateful fold advances position on
  // invalid segments), durations sum integer seconds, distances sum
  // per-segment e4-rounded integers (the deriveTripsExact
  // discipline). Every output number is an integer or a pass-through
  // input double — bit-identical across engines and batch orders.
  // ---------------------------------------------------------------------
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.eventsSec(s, dir)
    val snaps = e.select(
      concat(lit("b"), col("user_id")).as("bike_id"),
      concat(lit("p"), col("user_id") % 3).as("provider_id"),
      (abs(col("value") * 13.7) % 90).as("lat"),
      ((col("event_id").cast("double") * 3.3) % 180).as("lon"),
      col("ts_s").as("ts"))
    val p = graft.operators.TripParams(minGapSeconds = 60,
      maxGapSeconds = 86400, minTripMinutes = 1,
      maxTripMinutes = 1000000000d, minSegments = 2)
    graft.streaming.StatefulTrips.replayE4FromSnapshots(s, snaps, p)
      .orderBy("bike_id", "trip_start")
  }

  private val q171Sql = {
    val hav = graft.functions.Geo.haversineKmSql(
      "prev_lat", "prev_lon", "lat", "lon")
    s"""WITH snaps AS (
       |  SELECT 'b' || CAST(user_id AS VARCHAR) AS bike_id,
       |    'p' || CAST(user_id % 3 AS VARCHAR) AS provider_id,
       |    fmod(abs(value * 13.7), 90) AS lat,
       |    fmod(CAST(event_id AS DOUBLE) * 3.3, 180) AS lon,
       |    ${Exact.secSql("ts")} AS ts, event_id AS snap_id
       |  FROM events),
       |moves AS (
       |  SELECT bike_id, provider_id, lat, lon, ts, snap_id,
       |    lag(ts) OVER w AS prev_ts,
       |    lag(lat) OVER w AS prev_lat,
       |    lag(lon) OVER w AS prev_lon
       |  FROM snaps
       |  WINDOW w AS (PARTITION BY bike_id
       |                ORDER BY ts, lat, lon, snap_id)),
       |sess AS (
       |  SELECT *,
       |    CAST(epoch(ts) AS BIGINT) - CAST(epoch(prev_ts) AS BIGINT)
       |      AS gap_s,
       |    SUM(CASE WHEN prev_ts IS NULL
       |          OR CAST(epoch(ts) AS BIGINT)
       |             - CAST(epoch(prev_ts) AS BIGINT) > 86400
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY bike_id ORDER BY ts, lat, lon, snap_id
       |            ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM moves),
       |segs AS (
       |  SELECT *, CAST(round(($hav) * 10000) AS BIGINT) AS dist_e4
       |  FROM sess
       |  WHERE gap_s BETWEEN 60 AND 86400
       |    AND (prev_lat != lat OR prev_lon != lon)),
       |firstseg AS (
       |  SELECT bike_id, session_id, prev_ts AS a_ts,
       |    prev_lat AS a_lat, prev_lon AS a_lon
       |  FROM segs
       |  QUALIFY row_number() OVER (PARTITION BY bike_id, session_id
       |    ORDER BY ts, lat, lon, snap_id) = 1),
       |lastsnap AS (
       |  SELECT bike_id, session_id, ts AS z_ts, lat AS z_lat,
       |    lon AS z_lon
       |  FROM sess
       |  QUALIFY row_number() OVER (PARTITION BY bike_id, session_id
       |    ORDER BY ts DESC, lat DESC, lon DESC, snap_id DESC) = 1),
       |trips AS (
       |  SELECT bike_id, session_id, min(provider_id) AS provider_id,
       |    CAST(sum(gap_s) AS BIGINT) AS duration_s,
       |    CAST(sum(dist_e4) AS BIGINT) AS distance_e4,
       |    count(*) AS segment_count
       |  FROM segs
       |  GROUP BY bike_id, session_id
       |  HAVING CAST(sum(gap_s) AS BIGINT) BETWEEN 60 AND 60000000000
       |    AND CAST(sum(dist_e4) AS BIGINT) > 0 AND count(*) >= 2)
       |SELECT t.bike_id, t.provider_id,
       |  f.a_ts AS trip_start, l.z_ts AS trip_end,
       |  f.a_lat AS start_lat, f.a_lon AS start_lon,
       |  l.z_lat AS end_lat, l.z_lon AS end_lon,
       |  t.duration_s, t.distance_e4, t.segment_count
       |FROM trips t
       |JOIN firstseg f USING (bike_id, session_id)
       |JOIN lastsnap l USING (bike_id, session_id)
       |ORDER BY t.bike_id, trip_start""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q173 — point-in-time feature assembly (the feature-store join):
  // for every label event (purchase), attach each feature table's
  // LATEST observation at-or-before the label timestamp — the
  // leakage-free training-set construction every supervised pipeline
  // needs. Two chained AsOfJoin.lastBefore passes (one shuffle each,
  // no range explosion); feature tables are pre-aggregated to one row
  // per (user, second) so the at-tie payload is unambiguous on any
  // engine. Ages and values emit as integers; absent features as -1
  // sentinels (keeps every output column BIGINT-typed).
  // ---------------------------------------------------------------------
  private def q173(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.AsOfJoin
    val e = Tables.eventsSec(s, dir)
    val labels = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("label_id"), col("user_id"),
        col("ts_s").as("label_ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_s").as("click_ts"))
      .agg(round(max(col("value")) * 10000).cast("long").as("click_v_e4"))
    val errors = e.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_s").as("err_ts")).distinct()
    val f1 = AsOfJoin.lastBefore(labels, clicks, Seq("user_id"),
      "label_ts", "click_ts", Seq("click_ts", "click_v_e4"))
    val f2 = AsOfJoin.lastBefore(f1, errors, Seq("user_id"),
      "label_ts", "err_ts", Seq("err_ts"))
    f2.select(col("label_id"), col("user_id"),
        Exact.epochS(col("label_ts")).as("ts_l"),
        coalesce(col("label_ts").cast("long")
          - col("click_ts").cast("long"), lit(-1L)).as("click_age_s"),
        coalesce(col("click_v_e4"), lit(-1L)).as("click_v_e4"),
        coalesce(col("label_ts").cast("long")
          - col("err_ts").cast("long"), lit(-1L)).as("err_age_s"))
      .orderBy(col("label_id"))
  }

  private val q173Sql =
    s"""WITH e AS (
       |  SELECT event_id, user_id, ${Exact.secSql("ts")} AS ts_s,
       |    event_type, value
       |  FROM events),
       |labels AS (
       |  SELECT event_id AS label_id, user_id, ts_s AS label_ts
       |  FROM e WHERE event_type = 'purchase'),
       |clicks AS (
       |  SELECT user_id, ts_s AS click_ts,
       |    CAST(round(max(value) * 10000) AS BIGINT) AS click_v_e4
       |  FROM e WHERE event_type = 'click' GROUP BY 1, 2),
       |errors AS (
       |  SELECT DISTINCT user_id, ts_s AS err_ts
       |  FROM e WHERE event_type = 'error')
       |SELECT l.label_id, l.user_id,
       |  CAST(epoch(l.label_ts) AS BIGINT) AS ts_l,
       |  coalesce(CAST(epoch(l.label_ts) AS BIGINT) -
       |    (SELECT CAST(epoch(c.click_ts) AS BIGINT) FROM clicks c
       |     WHERE c.user_id = l.user_id AND c.click_ts <= l.label_ts
       |     ORDER BY c.click_ts DESC LIMIT 1), -1) AS click_age_s,
       |  coalesce(
       |    (SELECT c.click_v_e4 FROM clicks c
       |     WHERE c.user_id = l.user_id AND c.click_ts <= l.label_ts
       |     ORDER BY c.click_ts DESC LIMIT 1), -1) AS click_v_e4,
       |  coalesce(CAST(epoch(l.label_ts) AS BIGINT) -
       |    (SELECT CAST(epoch(er.err_ts) AS BIGINT) FROM errors er
       |     WHERE er.user_id = l.user_id AND er.err_ts <= l.label_ts
       |     ORDER BY er.err_ts DESC LIMIT 1), -1) AS err_age_s
       |FROM labels l
       |ORDER BY l.label_id""".stripMargin

  // ---------------------------------------------------------------------
  // q404 — perceptual image near-dup (dHash) on the REAL BMP codec:
  // every document's gradient BMP — plus, for every 5th document, a
  // brightness-shifted twin (+2 on all channels mod 256, same
  // dimensions; the "re-exported with different exposure" duplicate)
  // — is byte-decoded, sampled to a 9×8 integer-luma grid, and
  // difference-hashed to 64 bits packed as two unsigned-32 longs.
  // Candidates come from a 4×16-bit Hamming-band bucket join (never
  // all-pairs — the simhash discipline on the codec-grounded
  // fingerprint; pigeonhole gives recall 1.0 for Hamming ≤ 3, and
  // measured 84% of the shifted twins land within the gated ≤ 4
  // because dHash is shift-invariant away from mod-256 wraps). The
  // oracle replays the ENTIRE pipeline — sampling grid, luma
  // weights, bit packing, banding, popcount — from the gradient's
  // closed form without parsing a byte.
  // ---------------------------------------------------------------------
  private def q404(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.dhashPairs(
        graft.operators.Multimodal.syntheticBmpWithCopies(
          t(s, dir, "documents"), every = 5, delta = 2,
          copyOffset = 10000000L), maxHamming = 4)
      .orderBy(col("id_a"), col("id_b"))

  /** Closed-form oracle for the dHash near-dup gates, parameterized
    * by the twin cadence and id offset: q404 (BMP twins) and q524
    * (PNG-re-encoded twins) share it VERBATIM because the oracle
    * replays pixels, not containers — which is precisely the
    * cross-codec claim q524 makes about the Spark side. */
  private def dhashNeardupSql(every: Int, offset: Long): String =
    s"""WITH m AS (
      |  SELECT doc_id AS id, doc_id AS bid, 0 AS d FROM documents
      |  UNION ALL
      |  SELECT doc_id + $offset, doc_id, 2 FROM documents
      |  WHERE doc_id % $every = 0),
      |dims AS (
      |  SELECT id, bid, d,
      |    CAST(8 + bid % 9 AS BIGINT) AS w,
      |    CAST(8 + (bid // 9) % 7 AS BIGINT) AS h
      |  FROM m),
      |ys AS (SELECT *, unnest(range(0, 8)) AS y FROM dims),
      |cells AS (SELECT *, unnest(range(0, 8)) AS x FROM ys),
      |bits AS (
      |  SELECT id, y * 8 + x AS k,
      |    CASE WHEN
      |      2126 * ((bid * 7 + 3 * (((x+1) * w) // 9) + 5 * ((y*h) // 8)
      |        + d) % 256)
      |      + 7152 * ((bid * 11 + 13 * (((x+1) * w) // 9)
      |        + 17 * ((y*h) // 8) + d) % 256)
      |      + 722 * ((bid * 19 + 23 * (((x+1) * w) // 9)
      |        + 29 * ((y*h) // 8) + d) % 256)
      |      >
      |      2126 * ((bid * 7 + 3 * ((x * w) // 9) + 5 * ((y*h) // 8)
      |        + d) % 256)
      |      + 7152 * ((bid * 11 + 13 * ((x * w) // 9)
      |        + 17 * ((y*h) // 8) + d) % 256)
      |      + 722 * ((bid * 19 + 23 * ((x * w) // 9)
      |        + 29 * ((y*h) // 8) + d) % 256)
      |    THEN 1::BIGINT ELSE 0::BIGINT END AS bit
      |  FROM cells),
      |sigs AS (
      |  SELECT id,
      |    CAST(sum(CASE WHEN k >= 32 THEN bit << CAST(k - 32 AS INT)
      |      ELSE 0 END) AS BIGINT) AS hash_hi,
      |    CAST(sum(CASE WHEN k < 32 THEN bit << CAST(k AS INT)
      |      ELSE 0 END) AS BIGINT) AS hash_lo
      |  FROM bits GROUP BY id),
      |bands AS (
      |  SELECT id, hash_hi, hash_lo, unnest(range(0, 4)) AS band
      |  FROM sigs),
      |bucketed AS (
      |  SELECT id, hash_hi, hash_lo, band,
      |    CASE WHEN band < 2
      |      THEN (hash_lo >> CAST(band * 16 AS INT)) & 65535
      |      ELSE (hash_hi >> CAST((band - 2) * 16 AS INT)) & 65535
      |    END AS bucket
      |  FROM bands),
      |cand AS (
      |  SELECT DISTINCT bx.id AS id_a, by.id AS id_b
      |  FROM bucketed bx JOIN bucketed by
      |    ON bx.band = by.band AND bx.bucket = by.bucket
      |      AND bx.id < by.id)
      |SELECT c.id_a, c.id_b,
      |  CAST(bit_count(xor(sa.hash_hi, sb.hash_hi))
      |    + bit_count(xor(sa.hash_lo, sb.hash_lo)) AS BIGINT) AS hamming
      |FROM cand c
      |JOIN sigs sa ON sa.id = c.id_a
      |JOIN sigs sb ON sb.id = c.id_b
      |WHERE bit_count(xor(sa.hash_hi, sb.hash_hi))
      |  + bit_count(xor(sa.hash_lo, sb.hash_lo)) <= 4
      |ORDER BY id_a, id_b""".stripMargin

  private val q404Sql = dhashNeardupSql(every = 5, offset = 10000000L)

  // ---------------------------------------------------------------------
  // q524 — CROSS-CODEC perceptual near-dup (new r12): the q404
  // pipeline over a MIXED corpus — every document's gradient BMP
  // plus, for every 7th document, a PNG RE-ENCODE of the same
  // gradient brightness-shifted +2 (media_id = base + 2·10⁷). The
  // dHash batch dispatches per container signature into one shared
  // luma/grid core, so a PNG re-export of a BMP lands in the same
  // Hamming band as its base — the "same image, different codec,
  // different exposure" dedup class a real crawl corpus is full of.
  // The oracle is q404's closed form verbatim (pixels, not
  // containers) at the q524 cadence/offset.
  // ---------------------------------------------------------------------
  private def q524(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.dhashPairs(
        graft.operators.Multimodal.syntheticMixedWithPngCopies(
          t(s, dir, "documents"), every = 7, delta = 2,
          copyOffset = 20000000L), maxHamming = 4)
      .orderBy(col("id_a"), col("id_b"))

  private val q524Sql = dhashNeardupSql(every = 7, offset = 20000000L)

  // ---------------------------------------------------------------------
  // q525 — REAL GIF decode in the gate (new r12): a closed-form
  // palette-gradient image per document is encoded as a genuine
  // GIF89a (256-entry global color table, REAL LZW compression with
  // variable 9→12-bit codes and clear-code resets) and parsed back
  // by the validating decoder (header, color table, extension-block
  // walking, LZW incl. the KwKwK case, pixel-count check) in a
  // mapPartitions batch. The oracle composes pixel index and palette
  // in closed form without touching a byte — the q132/q517
  // discipline on the third real image codec, this one exercising
  // LZW instead of zlib.
  // ---------------------------------------------------------------------
  private def q525(s: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.decodeGifBatch(
        graft.operators.Multimodal.syntheticGif(t(s, dir, "documents")))
      .toDF()
      .orderBy(col("media_id"))

  private val q525Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(8 + doc_id % 9 AS BIGINT) AS w,
      |    CAST(8 + (doc_id // 9) % 7 AS BIGINT) AS h
      |  FROM documents),
      |xs AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
      |px AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM xs),
      |idx AS (
      |  SELECT doc_id, w, h,
      |    (doc_id * 23 + 5 * x + 3 * y) % 256 AS i
      |  FROM px),
      |v AS (
      |  SELECT doc_id, w, h,
      |    (3 * i + 5) % 256 AS r,
      |    (7 * i + 1) % 256 AS g,
      |    (11 * i + 2) % 256 AS b
      |  FROM idx)
      |SELECT doc_id AS media_id,
      |  CAST(max(w) AS INTEGER) AS width,
      |  CAST(max(h) AS INTEGER) AS height,
      |  CAST(sum(r) AS BIGINT) AS r_sum,
      |  CAST(sum(g) AS BIGINT) AS g_sum,
      |  CAST(sum(b) AS BIGINT) AS b_sum,
      |  CAST(max(2126 * r + 7152 * g + 722 * b) AS BIGINT) AS lum_max
      |FROM v
      |GROUP BY doc_id
      |ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q404_image_dhash_neardup" -> (q404 _),
    "q524_crosscodec_dhash_neardup" -> (q524 _),
    "q525_gif_decode" -> (q525 _),
    "q173_pit_features" -> (q173 _),
    "q171_streaming_trips" -> (q171 _),
    "q142_mobility_pipeline" -> (q142 _),
    "q111_cdc_apply" -> (q111 _),
    "q31_merge_upsert" -> (q31 _),
    "q32_multimodal_binary" -> (q32 _),
    "q56_scd2_merge" -> (q56 _),
    "q60_incremental_merge" -> (q60 _),
    "q75_scd2_snapshot" -> (q75 _),
    "q89_wav_decode" -> (q89 _),
    "q96_frame_sampling" -> (q96 _),
    "q132_bmp_decode" -> (q132 _),
    "q182_bmp_resize" -> (q182 _),
    "q206_wav_frames" -> (q206 _),
    "q207_luma_histogram" -> (q207 _))

  val oracle: Map[String, String] = Map(
    "q404_image_dhash_neardup" -> q404Sql,
    "q524_crosscodec_dhash_neardup" -> q524Sql,
    "q525_gif_decode" -> q525Sql,
    "q173_pit_features" -> q173Sql,
    "q171_streaming_trips" -> q171Sql,
    "q142_mobility_pipeline" -> q142Sql,
    "q111_cdc_apply" -> q111Sql,
    "q31_merge_upsert" -> q31Sql,
    "q32_multimodal_binary" -> q32Sql,
    "q56_scd2_merge" -> q56Sql,
    "q60_incremental_merge" -> q60Sql,
    "q75_scd2_snapshot" -> q75Sql,
    "q89_wav_decode" -> q89Sql,
    "q96_frame_sampling" -> q96Sql,
    "q132_bmp_decode" -> q132Sql,
    "q182_bmp_resize" -> q182Sql,
    "q206_wav_frames" -> q206Sql,
    "q207_luma_histogram" -> q207Sql)
}
