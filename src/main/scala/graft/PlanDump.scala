package graft
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` output (plus the AQE-final executed plan)
  * for a list of declared keys to `plans/r16/<key>_<suffix>.txt` — the
  * optimization round's before/after plan evidence. Usage:
  *   GRAFT_PLAN_SUFFIX=after GRAFT_PLAN_DIR=plans/r16 \
  *   sbt "runMain graft.PlanDump key1,key2 [sfDir]"
  * Not part of the graded surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "after")
    val outDir = sys.env.getOrElse("GRAFT_PLAN_DIR", "plans/r16")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialPartitions(sfDir, cpus.toInt,
          sys.env.getOrElse("GRAFT_ADVISORY_MB", "16").toLong << 20).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("GRAFT_ADVISORY_MB", "16") + "m")
      .config("spark.memory.storageFraction", "0.25")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    plans.GraftFunctions.register(spark)
    new java.io.File(outDir).mkdirs()
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val df = fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // execute so the AQE-final plan (coalesced reads, runtime join
      // strategy) is visible too
      df.queryExecution.toRdd.count()
      val fin = df.queryExecution.executedPlan.toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"),
        s"=== $k @ $sfDir (explain formatted, initial plan)\n" + formatted +
          s"\n=== $k AQE-final executed plan\n" + fin + "\n")
      println(s"[plandump] wrote $outDir/${k}_$suffix.txt")
    }
    spark.stop()
  }
}
