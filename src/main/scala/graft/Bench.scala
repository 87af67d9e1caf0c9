package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Chunked gate-bench coordinator (round 12): the one-JVM 523-query
    * gate accumulates shuffle-file/page-cache/block-manager state that
    * inflates the checkpoint/streaming tier's numbers late in the run
    * (the r11 +11% episode, classified as interference by isolated
    * rerun — see README). With SPARK_GRAFT_BENCH_CHUNKS=N the suite
    * runs as N FRESH CHILD JVMs over contiguous query ranges, each a
    * normal single-JVM bench with its own warmups and BOTH canaries;
    * the merged archive carries every chunk's full document under
    * "chunks" so tools/bench_diff.py can normalize each query by ITS
    * OWN chunk's canaries. The driver contract (one summary line on
    * stdout) is preserved; default (env unset) stays one-JVM.
    */
  private def runChunked(n: Int, sfDir: String): Unit = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    val per = math.ceil(names.size.toDouble / n).toInt
    val groups = names.grouped(per).toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft_bench_chunks")
    val javaBin = java.nio.file.Paths
      .get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
      "java.io", "java.net", "java.nio", "java.util",
      "java.util.concurrent", "java.util.concurrent.atomic",
      "sun.nio.ch", "sun.nio.cs", "sun.security.action",
      "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    case class Chunk(full: String, summary: String)
    val chunks = groups.zipWithIndex.map { case (g, i) =>
      val dir = java.nio.file.Files.createDirectory(
        tmp.resolve(s"chunk_$i"))
      val out = dir.resolve("full.json")
      val cmd = Seq(javaBin) ++ addOpens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
        "-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", g.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_FULL", out.toString)
      pb.environment().remove("SPARK_GRAFT_BENCH_CHUNKS")
      pb.redirectErrorStream(true)
      pb.redirectOutput(dir.resolve("log").toFile)
      System.err.println(s"[bench] chunk ${i + 1}/${groups.size} " +
        s"(${g.size} queries, fresh JVM) ...")
      val code = pb.start().waitFor()
      require(code == 0,
        s"chunk $i exited $code — see ${dir.resolve("log")}")
      Chunk(
        new String(java.nio.file.Files.readAllBytes(out), "UTF-8"),
        new String(java.nio.file.Files.readAllBytes(
          dir.resolve("BENCH_SUMMARY.json")), "UTF-8"))
    }
    def ext(re: String, s: String): Option[String] =
      re.r.findFirstMatchIn(s).map(_.group(1))
    val total = chunks
      .map(c => ext("\"value\":([-0-9.Ee+]+)", c.summary).get.toDouble).sum
    val failed = chunks
      .map(c => ext("\"failed\":([0-9]+)", c.summary).get.toInt).sum
    // global slowest-5 from the chunk summaries' own slowest-5 maps
    val pair = "\"(q[^\"]+)\":([-0-9.Ee+]+)".r
    val slow = chunks.flatMap { c =>
      ext("\"queries\":\\{([^}]*)\\}", c.summary).toSeq.flatMap(body =>
        pair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble))
    }.sortBy(-_._2).take(5)
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val merged =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","chunked":true,"n_chunks":${chunks.size},"chunks":[${chunks.map(_.full).mkString(",")}],"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json"))
    java.nio.file.Files.write(outPath, merged.getBytes("UTF-8"))
    val slowJson = slow.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val canaries = chunks.map(c =>
      ext("\"canary_med\":([-0-9.Ee+]+)", c.summary).getOrElse("0"))
      .mkString("[", ",", "]")
    val ioCanaries = chunks.map(c =>
      ext("\"canary_io_med\":([-0-9.Ee+]+)", c.summary).getOrElse("0"))
      .mkString("[", ",", "]")
    val summary =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${SparkEntry.queries.size},"mean":${r3(total / SparkEntry.queries.size)},"failed":$failed,"chunked":true,"chunk_canaries":$canaries,"chunk_io_canaries":$ioCanaries,"queries":$slowJson,"queries_full":"${outPath.toAbsolutePath}","sf":"$sfDir"}"""
    java.nio.file.Files.write(
      outPath.resolveSibling("BENCH_SUMMARY.json"),
      summary.getBytes("UTF-8"))
    println(summary)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val chunkedN = sys.env.get("SPARK_GRAFT_BENCH_CHUNKS")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ >= 2)
    if (chunkedN.isDefined) { runChunked(chunkedN.get, sfDir); return }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // the engine's session factory: UTC, nanosAsLong, AQE + extensions
    val spark = graft.core.GraftSession.local(cpus)
    // Two warmup passes (JIT + codegen compilation + parquet footer
    // cache — C2 compilation of the interpreted higher-order-function
    // paths needs more than one invocation to kick in), then the
    // measured pass — steady-state throughput, which is what a
    // long-running cluster job actually sees.
    // optional diagnostic subset, e.g. SPARK_GRAFT_BENCH_ONLY=q22,q23
    // (prefix match up to '_' so 'q22' selects q22_dedup_minhash_lsh
    // but 'q2' selects nothing; entries trimmed; blank = full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(p =>
        n == p || n.startsWith(p + "_"))))
    // noop sink, NOT count(): count() lets the optimizer prune every
    // unreferenced column and eliminate sorts, so projection-heavy
    // queries (simhash, fingerprints, text stats) would "run" without
    // computing their payload. The noop writer consumes every row in
    // full — the honest end-to-end cost.
    def run(name: String): Boolean =
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.mode("overwrite").format("noop").save()
        true
      } catch { case _: Throwable => false }
      finally {
        // drop THIS run's leftovers (localCheckpoint RDDs): each
        // invocation builds its own, so without this 3 passes × 86
        // queries accumulate dead blocks and the tail of the suite
        // pays their GC/memory pressure. Nothing is reused across
        // runs — this is cleanup, not caching.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    // pass counts are env-tunable for the big-SF runs: at sf1 a full
    // 2+2 protocol is hours; 1 warmup + 1 measured pass still gives
    // growth-factor-accurate numbers (the times are large relative to
    // noise there). Defaults keep the per-round sf0.1 protocol.
    val warmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "2").toInt
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    // drift canary: a fixed, SF-independent, CPU-bound probe (hash +
    // reduce over a generated range — no IO, no shuffle) interleaved
    // every ~50 queries during the measured passes. Its time series
    // measures MACHINE drift inside the run itself, so a uniform
    // cross-round shift (the r6/r8 "+17% on identical code" episodes,
    // previously diagnosed forensically over hours) is read off the
    // archive directly: same-code runs with canary medians 10% apart
    // ARE 10% machine drift, and tools/bench_diff.py annotates /
    // normalizes its regression calls by exactly this ratio.
    val canaryTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def canary(): Unit = {
      val t0 = System.nanoTime()
      // pmod keeps the ANSI sum in range (full-range xxhash64 longs
      // would overflow on the second row); the hash still dominates
      spark.range(0L, 20000000L, 1L, 8)
        .selectExpr("pmod(xxhash64(id), 1000000) AS h")
        .agg(org.apache.spark.sql.functions.sum("h"))
        .write.mode("overwrite").format("noop").save()
      canaryTimes += (System.nanoTime() - t0) / 1e9
    }
    // second canary (round 12): a fixed-size SHUFFLE + localCheckpoint
    // probe. The CPU canary is blind to exactly the medium the
    // checkpoint/streaming tier is sensitive to — shuffle-file and
    // block-manager disk IO plus page-cache state accumulated over a
    // 500-query gate (the r10/r11 q309 episodes: isolated 4.06 s vs
    // in-gate 8.02 s at an IDENTICAL CPU canary). This probe writes
    // real shuffle files (1 M rows repartitioned by key), materializes
    // a checkpoint through the block manager, and reads both back —
    // so its time series moves with the same machine state those
    // queries feel. tools/bench_diff.py normalizes IO-class queries
    // (any pin()/streaming-start during their run, see `ioclass`
    // below) by THIS canary's ratio and the rest by the CPU one.
    val ioCanaryTimes = scala.collection.mutable.ArrayBuffer.empty[Double]
    def ioCanary(): Unit = {
      val t0 = System.nanoTime()
      val pinned = spark.range(0L, 1000000L, 1L, 8)
        .selectExpr("id", "pmod(xxhash64(id), 4096) AS k")
        .repartition(32, org.apache.spark.sql.functions.col("k"))
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.sum("id").as("s"))
        .localCheckpoint()
      pinned.write.mode("overwrite").format("noop").save()
      ioCanaryTimes += (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    (1 to warmups).foreach { _ => canary(); ioCanary(); names.foreach(run) }
    canaryTimes.clear() // warmup samples JIT the canary; don't record them
    ioCanaryTimes.clear()
    // a throwing query records -1, never a fast "success": a broken
    // query must not improve the benchmark total
    // per-query IO classification, recorded DURING the measured passes
    // in PlanStats light-count mode (atomic increments only — no plan
    // text is rendered, so the measurement itself is undisturbed):
    // ioclass(q) = pin()/checkpoint rounds + streaming-query starts
    // observed while q ran. Any positive value marks q IO-class for
    // bench_diff's canary selection.
    val ioClass = scala.collection.mutable.Map.empty[String, Int]
    // scaling observability (round 13; PERF_r12 `suspect_cpus_ignored`):
    // per-query completed-task count and summed task time, from a
    // cumulative listener differenced OUTSIDE the timed region (the
    // bus drain happens after the per-query clock stops, and before
    // the next query's clock starts). At sf0.1 a wall ratio of ≈1
    // between 8 and 32 cores plus equal task counts/task-seconds is
    // the signature of "parallel but overhead-bound", which the
    // wall-clock-only archive could not distinguish from "serial".
    val taskProbe = org.apache.spark.sql.graftx.TaskProbe
    taskProbe.install(spark.sparkContext)
    val taskCounts = scala.collection.mutable.Map.empty[String, Long]
    val taskSecs = scala.collection.mutable.Map.empty[String, Double]
    def measure(): Map[String, Double] = {
      graft.core.PlanStats.enableLightCount()
      var snap = taskProbe.snapshot(spark.sparkContext)
      val out = names.zipWithIndex.map { case (name, i) =>
        if (i % 50 == 0) { canary(); ioCanary()
          snap = taskProbe.snapshot(spark.sparkContext) }
        graft.core.PlanStats.reset()
        val t0 = System.nanoTime()
        val ok = run(name)
        val dt = (System.nanoTime() - t0) / 1e9
        val now = taskProbe.snapshot(spark.sparkContext)
        taskCounts(name) = now._1 - snap._1
        taskSecs(name) = math.rint((now._2 - snap._2) / 1000.0 * 1000) / 1000
        snap = now
        val io = graft.core.PlanStats.checkpoints +
          graft.core.PlanStats.streamingStarts +
          graft.core.PlanStats.batchSinkIos
        ioClass(name) = math.max(ioClass.getOrElse(name, 0), io)
        name -> (if (ok) dt else -1.0)
      }.toMap
      graft.core.PlanStats.disableLightCount()
      canary(); ioCanary() // closing samples per pass
      out
    }
    // SEPARATED measured passes, min per query: steady-state timing
    // that a transient external load spike (which spans one pass, not
    // both) cannot inflate. A -1 failure is sticky — min keeps it.
    val ms = (1 to passes).map(_ => measure())
    val results = names.map(n => n -> ms.map(_(n)).min).toMap
    // per-query noise band: max-min across the measured passes. A
    // cross-round diff smaller than a query's own spread is not a
    // regression call (tools/bench_diff.py consumes this); one pass
    // means no band is observable — spread is omitted, not zero. A
    // query with ANY failed (-1) pass is omitted too: its max-min
    // would be (time − (−1)), a meaningless giant band that would
    // make bench_diff mark every real delta on that query as noise —
    // no key means bench_diff falls back to no band for it.
    val spreads: Option[Map[String, Double]] = if (passes >= 2)
      Some(names.filter(n => ms.forall(_(n) >= 0)).map(n =>
        n -> (ms.map(_(n)).max - ms.map(_(n)).min)).toMap)
    else None
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // The harness that collects this output keeps only the last ~2 kB
    // of stdout; a single JSON line with ~142 per-query timings is
    // ~5 kB and gets truncated mid-object (unparseable). So: the FULL
    // per-query map goes to a file, and stdout carries exactly one
    // short (<1 kB) summary line — total, mean, slowest-5, and the
    // path to the full dump.
    val qs = names.map(n => s"\"" + n + "\":" + results(n))
      .mkString("{", ",", "}")
    val spreadJson = spreads.map(sp => names.filter(sp.contains).map(n =>
      s"\"" + n + "\":" + math.rint(sp(n) * 1000) / 1000)
      .mkString(",\"spread\":{", ",", "}")).getOrElse("")
    // plan fingerprints for the slowest 10: exchange/broadcast counts
    // + interpreted-HOF presence, so a q217-style pathology (one
    // query dominating the bench via a per-row lambda) is visible in
    // this run's own artifact, not only in a later judge pass.
    // PlanStats makes the counts see THROUGH localCheckpoint: each
    // pin() records its pre-checkpoint DAG while the query is being
    // constructed (pins execute eagerly, so "constructing" a
    // checkpointed query runs its pinned subtrees — the honest price
    // of fingerprinting the iterative queries at all), and the final
    // plan's counts are added on top. `checkpoints` is the pin-round
    // count — an iterative query that silently gains rounds regresses
    // visibly here even if each round's plan is unchanged.
    graft.core.PlanStats.enable()
    val fingerprints = results.toSeq.sortBy(-_._2).take(10).map {
      case (name, _) =>
        val fp = try {
          graft.core.PlanStats.reset()
          val p = SparkEntry.queries(name)(spark, sfDir)
            .queryExecution.executedPlan.toString
          val ex = ("Exchange hashpartitioning".r.findAllIn(p).length +
            "Exchange rangepartitioning".r.findAllIn(p).length) +
            graft.core.PlanStats.exchanges
          val bc = "BroadcastExchange".r.findAllIn(p).length +
            graft.core.PlanStats.broadcasts
          val cp = graft.core.PlanStats.checkpoints
          val hof = p.toLowerCase.contains("lambdafunction") ||
            graft.core.PlanStats.sawInterpretedHof
          s"""{"exchanges":$ex,"broadcasts":$bc,"checkpoints":$cp,"interpreted_hof":$hof}"""
        } catch { case _: Throwable => """{"err":true}""" }
        finally spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        s"\"" + name + "\":" + fp
    }.mkString("{", ",", "}")
    graft.core.PlanStats.disable()
    def r3v(v: Double): Double = math.rint(v * 1000) / 1000
    val canarySorted = canaryTimes.sorted
    val canaryMed = if (canarySorted.isEmpty) 0.0
      else canarySorted(canarySorted.size / 2)
    val canaryJson = canaryTimes.map(r3v).mkString(
      s""","canary":{"median":${r3v(canaryMed)},"times":[""", ",", "]}")
    val ioSorted = ioCanaryTimes.sorted
    val ioCanaryMed = if (ioSorted.isEmpty) 0.0 else ioSorted(ioSorted.size / 2)
    val ioCanaryJson = ioCanaryTimes.map(r3v).mkString(
      s""","canary_io":{"median":${r3v(ioCanaryMed)},"times":[""", ",", "]}")
    // only the positive entries: ~100 IO-class queries of 523, and
    // absence = CPU-class, so the map stays small
    val ioClassJson = names.filter(n => ioClass.getOrElse(n, 0) > 0)
      .map(n => s"\"" + n + "\":" + ioClass(n))
      .mkString(""","ioclass":{""", ",", "}")
    // per-query task counts + summed task seconds (last measured
    // pass): the scaling-contract evidence — identical tasks and
    // task_sec at different $SPARK_GRAFT_CPUS values proves the
    // parallelism is real and the ≈1 wall ratio is fixed overhead
    val tasksJson = names.filter(taskCounts.contains)
      .map(n => s"\"" + n + "\":" + taskCounts(n))
      .mkString(""","tasks":{""", ",", "}")
    val taskSecJson = names.filter(taskSecs.contains)
      .map(n => s"\"" + n + "\":" + taskSecs(n))
      .mkString(""","task_sec":{""", ",", "}")
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$spreadJson$canaryJson$ioCanaryJson$ioClassJson$tasksJson$taskSecJson,"plans_slowest":$fingerprints,"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "bench_full.json"))
    java.nio.file.Files.write(outPath, fullJson.getBytes("UTF-8"))
    // per-round archive: bench_full.json is overwritten every run, so
    // cross-round regression tables need a committed copy per round.
    // Round number = SPARK_GRAFT_ROUND, else max existing BENCH_r*.json
    // + 1 (the driver writes BENCH_r<N> AFTER this bench runs).
    // Round inference needs at least one BENCH_r*.json next to the
    // output file; with SPARK_GRAFT_BENCH_FULL pointed at a fresh
    // directory the fallback would restart at r0 and could silently
    // overwrite an unrelated bench_full_r0.json — so without either
    // an explicit SPARK_GRAFT_ROUND or an inferable round, skip the
    // archive (bench_full.json itself is always written).
    if (only.isEmpty) {
      val roundN: Option[Int] = sys.env.get("SPARK_GRAFT_ROUND").flatMap(r =>
        scala.util.Try(r.toInt).toOption).orElse {
        val re = "BENCH_r0*([0-9]+)\\.json".r
        val seen = Option(outPath.toAbsolutePath.getParent.toFile.list())
          .getOrElse(Array.empty[String])
          .collect { case re(n) => n.toInt }
        if (seen.nonEmpty) Some(seen.max + 1) else None
      }
      roundN.foreach(n => java.nio.file.Files.write(
        outPath.resolveSibling(s"bench_full_r$n.json"),
        fullJson.getBytes("UTF-8")))
    }
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val mean = if (results.nonEmpty) total / results.size else 0.0
    val failed = results.count(_._2 < 0)
    // "queries" here is the slowest-5 subset (driver-schema-compatible
    // map); the complete map lives in the file named by queries_full.
    val slowest = results.toSeq.sortBy(-_._2).take(5)
      .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val summary =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n":${results.size},"mean":${r3(mean)},"failed":$failed,"canary_med":${r3(canaryMed)},"canary_io_med":${r3(ioCanaryMed)},"queries":$slowest,"queries_full":"${outPath.toAbsolutePath}","sf":"$sfDir"}"""
    // sidecar twin of the stdout line: a parser that misses the tail
    // (sbt banners, truncation) can read this file instead
    java.nio.file.Files.write(
      outPath.resolveSibling("BENCH_SUMMARY.json"),
      summary.getBytes("UTF-8"))
    spark.stop()
    // AFTER spark.stop(): no executor/shutdown logging can interleave
    // behind it — this is the final stdout line of the run
    println(summary)
  }
}
