package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: PlanDump <outDir> <suffix> [query-name-or-prefix ...]")
      sys.exit(2)
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1) // "before" | "after"
    val names = args.drop(2)
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    names.foreach { n =>
      // exact name wins; a prefix must be unambiguous (r12 advice:
      // find() resolved 'q12' to an arbitrary one of q120..q129)
      val matches = SparkEntry.queries.keys.toSeq.filter(k =>
        k == n || k.startsWith(n + "_")).sorted
      val full = matches match {
        case Seq(one) => one
        case Seq() => sys.error(s"no query $n")
        case many => sys.error(
          s"ambiguous prefix $n: ${many.mkString(", ")}")
      }
      try {
        // SPARK_GRAFT_PLANDUMP_PINS=1 additionally captures every
        // pin's PRE-CHECKPOINT executed plan (r13): iterative/pinned
        // queries do their real work inside checkpointed subtrees,
        // which the final static explain cannot show once lineage is
        // truncated — the pinned-subtree log is where a join-strategy
        // or codegen claim about those queries is checkable.
        val dumpPins = sys.env.get("SPARK_GRAFT_PLANDUMP_PINS")
          .exists(_ == "1")
        if (dumpPins) graft.core.PlanStats.enablePlanLog()
        val df = SparkEntry.queries(full)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${full}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        if (dumpPins) {
          graft.core.PlanStats.disablePlanLog()
          val pins = graft.core.PlanStats.loggedPlans
          if (pins.nonEmpty) {
            val body = pins.zipWithIndex.map { case (p, i) =>
              s"== Pinned subtree ${i + 1}/${pins.size} " +
                s"(pre-checkpoint executed plan) ==\n$p"
            }.mkString("\n")
            java.nio.file.Files.write(
              outDir.resolve(s"${full}_${suffix}_pins.txt"),
              body.getBytes("UTF-8"))
          }
        }
        System.err.println(s"[plandump] wrote $full")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] FAIL $full: $e")
      } finally spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
