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
        val df = SparkEntry.queries(full)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(outDir.resolve(s"${full}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $full")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] FAIL $full: $e")
      } finally spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
