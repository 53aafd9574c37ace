package graft
import org.apache.spark.sql.SparkSession

/** Session sizing + inter-key hygiene shared by the three mains
  * (Bench / Verify / Explain). Each main keeps its own builder — the
  * per-conf rationale comments at those sites are load-bearing — but the
  * two DATA-dependent pieces live here so they can be spec-pinned once.
  */
object Sessions {
  /** Data-driven AQE start parallelism (r16, VERDICT r15 task 3).
    *
    * AQE coalesces every shuffle DOWN from
    * `coalescePartitions.initialPartitionNum` to the advisory size, so
    * that conf is the reduce-side parallelism CEILING. The previous
    * fixed 8×cpus ceiling binds before the 16 MB advisory does once a
    * shuffle carries more than 8×cpus×16 MB ≈ 4 GB (~1000× fixture
    * scale): past that point per-reducer bytes grow with data again and
    * the 300×-class sort-spill defect returns one decade later. Derive
    * the ceiling from the INPUT footprint instead — parquet bytes on
    * disk divided by the advisory — so the conf needs no manual retune
    * per SF:
    *
    *  - floor 8×cpus: fixture SFs (footprint ≪ 8×cpus×advisory) keep
    *    exactly the r15 plans and task counts;
    *  - ceiling 4096: a runaway footprint must not schedule 100k no-op
    *    reducers at local[32] (task dispatch is ~0.15 ms each; AQE
    *    coalesces real bytes but pays planning per initial partition).
    *    On a real cluster raise the cap with the executor count.
    *
    * Parquet bytes UNDERSTATE shuffle bytes (columnar+dictionary vs lz4
    * rows, measured 2–6× on the grown fixtures), but the advisory
    * over-splits in the same direction (AQE merges small reducers for
    * free; it can never split one giant one without the headroom), so
    * the footprint is the right cheap proxy for the ceiling.
    */
  def initialPartitions(sfDir: String, cpus: Int, advisoryBytes: Long): Int = {
    require(advisoryBytes > 0, s"advisoryBytes must be > 0: $advisoryBytes")
    val byData = parquetFootprint(new java.io.File(sfDir)) / advisoryBytes + 1
    math.min(4096L, math.max(8L * cpus, byData)).toInt
  }

  /** Recursive on-disk bytes of `*.parquet` files under `dir` (Spark
    * writes directories of part-…….parquet files; both layouts match).
    * Unreadable/absent paths count 0 — sizing falls back to the floor,
    * never throws (the read itself will surface a real missing-dir). */
  private[graft] def parquetFootprint(f: java.io.File): Long =
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids == null) 0L else kids.map(parquetFootprint).sum
    } else if (f.getName.endsWith(".parquet")) f.length
    else 0L

  /** Inter-key executor-state hygiene (r16, VERDICT r15 task 2).
    *
    * A 187-key suite leaves two kinds of litter in the block manager
    * between keys, and both were measured taxing LATER keys at 100×
    * grown (vec_ann_ivfpq: 9.5 s suite-context vs 1.7 s isolated —
    * every new broadcast put had to disk-evict dead blocks first):
    *
    *  - finished localCheckpoints (DistRank's range-sorted frames, the
    *    dedup superstep cuts): each key rebuilds its own on the next
    *    invocation, so after the key's action returns they are dead
    *    weight — unpersist explicitly (non-blocking; removal overlaps
    *    the next key's planning).
    *  - finished broadcasts: destroyed only by ContextCleaner once the
    *    driver-side references are GC'd, and a 32 GB driver heap under
    *    no allocation pressure may not GC for many keys. Force the GC
    *    so the cleaner's reference queue drains NOW — but only when the
    *    heap is actually littered (> half of max used while idle
    *    between keys): an unconditional System.gc() per sample is a
    *    full STW pause ×561 samples, and at fixture SF the litter never
    *    accumulates enough to matter (anchor timings stay untouched).
    *
    * Runs OUTSIDE every timed region (Bench calls it before each
    * sample's t0; Verify between key writes).
    */
  /** Silence two benign-but-flooding executor warnings (r17, VERDICT r16
    * noise item): every audited unpartitioned window in the registry sits
    * on a domain-bounded post-aggregate (PlanSpec's single-partition
    * sweep is the structural guarantee), yet WindowExec warns per plan —
    * hundreds of lines per Verify/test run that bury real warnings; the
    * DistRank localCheckpoint unpersist warning is likewise by-design
    * (each key rebuilds its own blocks). Log level only — no behavior
    * change. Called by the mains after setLogLevel. */
  def quietBenignWarnings(): Unit =
    try {
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.rdd.MapPartitionsRDD",
        org.apache.logging.log4j.Level.ERROR)
    } catch { case scala.util.control.NonFatal(_) => () }

  def releaseKeyState(spark: SparkSession): Unit = {
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    val rt = Runtime.getRuntime
    if (rt.totalMemory - rt.freeMemory > rt.maxMemory / 2) System.gc()
  }
}
