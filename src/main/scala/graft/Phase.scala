package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main for the optimization rounds (guide §1: measure first).
  *
  * Bench's plan_sec/exec_sec split is too coarse under AQE: `toRdd` on an
  * AdaptiveSparkPlanExec materializes every intermediate query stage, so
  * "plan_sec" silently contains most of the execution. This main splits a
  * key's wall into the phases that can actually be attributed:
  *
  *   build    — the Q builder call (any eager DistRank/training jobs land here)
  *   analyze  — qe.analyzed
  *   optimize — qe.optimizedPlan
  *   plan     — qe.executedPlan (physical planning, pre-AQE)
  *   toRdd    — AQE stage materialization + codegen of final stage
  *   count    — the terminal stage
  *
  * plus the number of Spark jobs/stages/tasks launched inside the sample —
  * at fixture SF each job is mostly dispatch floor, so jobs×floor is the
  * first-order model of a key's fixture-scale cost.
  *
  * Never part of the graded surface; results are printed per key as one
  * JSON line each. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   GRAFT_PHASE_KEYS=k1,k2 sbt "runMain graft.Phase"
  */
object Phase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val keys = sys.env.get("GRAFT_PHASE_KEYS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val qmap = SparkEntry.queries
    keys.foreach { k =>
      require(qmap.contains(k), s"unknown key: $k")
    }
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    val stageCount = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobCount.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stageCount.incrementAndGet()
          taskCount.addAndGet(s.stageInfo.numTasks)
        }
      })
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case scala.util.control.NonFatal(_) => Thread.sleep(150) }
    // JIT/codegen warmup at the smallest SF, same as Bench
    val warmDir = "/root/testdata/sf0.001"
    keys.foreach { k =>
      try qmap(k)(spark, warmDir).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    // Pre-warm trained memos at the probe SF (construction only)
    keys.foreach { k =>
      try qmap(k)(spark, sfDir) catch { case _: Throwable => () }
    }
    val reps = sys.env.getOrElse("GRAFT_PHASE_RUNS", "3").toInt
    for (_ <- 1 to reps; k <- keys) {
      Sessions.releaseKeyState(spark)
      drain()
      val j0 = jobCount.get; val s0 = stageCount.get; val t0c = taskCount.get
      val t0 = System.nanoTime()
      val df = qmap(k)(spark, sfDir)
      val t1 = System.nanoTime()
      val qe = df.queryExecution
      qe.assertAnalyzed()
      val t2 = System.nanoTime()
      qe.optimizedPlan
      val t3 = System.nanoTime()
      qe.executedPlan
      val t4 = System.nanoTime()
      val rdd = qe.toRdd
      val t5 = System.nanoTime()
      rdd.count()
      val t6 = System.nanoTime()
      drain()
      def s(a: Long, b: Long): String = f"${(b - a) / 1e9}%.3f"
      println(s"""{"key":"$k","build":${s(t0, t1)},"analyze":${s(t1, t2)},""" +
        s""""optimize":${s(t2, t3)},"plan":${s(t3, t4)},""" +
        s""""toRdd":${s(t4, t5)},"count":${s(t5, t6)},""" +
        s""""total":${s(t0, t6)},"jobs":${jobCount.get - j0},""" +
        s""""stages":${stageCount.get - s0},"tasks":${taskCount.get - t0c}}""")
    }
    spark.stop()
  }
}
