package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // Optional 3rd arg: comma-separated key filter for fast local smokes
    // (`runMain graft.Verify <sf> <out> key1,key2`). The driver always
    // passes exactly two args → full dump; contract unchanged.
    val Array(sfDir, outDir) = args.take(2)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    // A typo'd filter that matches nothing would dump zero keys and exit
    // 0 — fail loudly instead (code-review r10).
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"key filter names unknown keys: ${unknown.mkString(", ")}")
    }
    // GRAFT_VERIFY_EXCLUDE=k1,k2 (r15, VERDICT r14 task 5): the
    // exactness-tier decision caps text_ngram_jaccard's tier at ~100x
    // (its 300x shuffle projection exceeds this host's disk), so sweeps
    // above that must drop the key WITHOUT enumerating the other 186 —
    // scale_sweep.sh sets this env. Excluded runs are marked filtered in
    // keys.json, exactly like an explicit include filter.
    val exclude = sys.env.get("GRAFT_VERIFY_EXCLUDE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val unknownEx = exclude -- SparkEntry.queries.keySet
    require(unknownEx.isEmpty,
      s"GRAFT_VERIFY_EXCLUDE names unknown keys: ${unknownEx.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // HotSpot never JIT-compiles methods over 8000 bytecode bytes
      // (DontCompileHugeMethods), while Spark's default fallback only
      // trips at 65535 — stages whose generated whole-stage method lands
      // in between run as INTERPRETED BYTECODE: vec_ann_ivfpq's fused
      // candidate-scoring stage cost 30 s at 100x grown vs 2.8 s with
      // the fallback aligned to the JIT's real limit (r14 task 7
      // bisection). 8000 makes Spark fall back to per-operator execution
      // exactly where the JIT would refuse anyway — strictly
      // faster-or-neutral, results unchanged (execution strategy only).
      .config("spark.sql.codegen.hugeMethodLimit", "8000")
      // Data-scaled reduce parallelism (see Bench.scala): AQE coalesces
      // back to small task counts at fixture SF; big sweeps get enough
      // reducers to stay spill-free. r16: ceiling derived from the input
      // footprint (Sessions.initialPartitions) — the fixed 8×cpus cap
      // would re-bind per-reducer bytes to data above ~1000×.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        Sessions.initialPartitions(sfDir, cpus.toInt,
          sys.env.getOrElse("GRAFT_ADVISORY_MB", "16").toLong << 20).toString)
      // 16 MB advisory reducer size (r15): the reduce-side sort holds
      // 4-10x the compressed bytes in unsafe-row form; the default 64 MB
      // spilled the 300x SMJ/as-of sorts under 32-way concurrency (see
      // Bench for the full account).
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("GRAFT_ADVISORY_MB", "16") + "m")
      // Storage-pool floor 0.25 (r15): the probe bench runs 14 keys in one
      // session; earlier keys' not-yet-GC'd broadcasts sit in the storage
      // pool, and the default storageFraction=0.5 protects up to half of
      // unified memory from execution eviction — join_asof's 300x sort
      // spilled in-suite (1.1 GB) while running spill-free solo. 0.25
      // caps the unevictable litter; broadcasts evict to disk harmlessly.
      .config("spark.memory.storageFraction", "0.25")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts physical-type handling (µs timestamp vs legacy INT64
      // nanos) lives in Tables.events, which branches on the resolved
      // schema — no session-wide legacy conf needed here.
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietBenignWarnings()
    // Native functions + rewrites (graft_dot, TopKPerGroup) active for the
    // whole run — plan choice must not depend on query iteration order.
    plans.GraftFunctions.register(spark)
    // Confs whose declared DuckDB oracle is pinned to the default value:
    // running a correctness dump with a non-default override would make
    // the hash-checked key silently diverge from its oracle and read as
    // an engine bug (ADVICE r5). Parameter sweeps belong in the property
    // tests, not here — fail fast.
    Seq("graft.cm.depth" -> "2", "graft.cm.width" -> "4096").foreach {
      case (k, default) =>
        val v = spark.conf.getOption(k)
        require(v.forall(_ == default),
          s"$k=${v.get} overrides the oracle-pinned default $default; " +
            "unset it for a correctness run")
    }
    new java.io.File(outDir).mkdirs()
    // Key-set manifest (VERDICT r8 missing #2): r08's fixture drift made 19
    // keys throw at plan time; the per-key catch below kept the dump alive
    // but nothing downstream noticed the holes. Record registry/attempted/
    // failed so preflight.py can hard-fail when ANY registry key is absent
    // from the verified output instead of silently grading a subset.
    val attempted = SparkEntry.queries.keys.toSeq
      .filter(name => only.forall(_.contains(name)) && !exclude(name))
      .sorted
    // A filter and an exclude that are both individually valid can still
    // intersect to zero keys (ADVICE r15) — a dump of nothing exiting 0
    // would read downstream as a (vacuously) clean run.
    require(attempted.nonEmpty,
      "key filter + GRAFT_VERIFY_EXCLUDE select zero keys")
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    attempted.foreach { name =>
      val fn = SparkEntry.queries(name)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Dead localCheckpoints + GC-pending broadcasts from the finished
      // key must not squat in the storage pool while the NEXT key builds
      // its broadcasts (r16, VERDICT r15 task 2 — see Sessions).
      Sessions.releaseKeyState(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    def arr(xs: Seq[String]): String = xs.map(q).mkString("[", ",", "]")
    // "filtered" records whether a key filter was explicitly passed, so
    // preflight can distinguish a legitimate local smoke from a full run
    // that silently dropped registry keys (ADVICE r9: deriving "full run"
    // from attempted==registry made the never-attempted hard-fail dead code).
    Files.writeString(Paths.get(s"$outDir/keys.json"),
      s"""{"registry": ${arr(SparkEntry.queries.keys.toSeq.sorted)},""" +
        s""" "attempted": ${arr(attempted)},""" +
        s""" "failed": ${arr(failed.toSeq.sorted)},""" +
        s""" "filtered": ${only.nonEmpty || exclude.nonEmpty}}""")
    spark.stop()
    // Exit 0 even with failures so a partial dump still reaches the
    // driver's compare (partial grades beat none); the manifest makes the
    // holes impossible to miss — preflight.py hard-fails on them locally.
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} key(s) FAILED: " +
        failed.mkString(", "))
  }
}
