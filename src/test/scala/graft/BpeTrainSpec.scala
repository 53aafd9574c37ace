package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.PipelineOps.bpeTrainLocal]] — the r13 scale-shaped
  * BPE trainer (VERDICT r12 task 2) — must be bit-identical to the naive
  * greedy specification (recount every pair every round; argmax by freq
  * desc then lexicographically smallest (l, r); greedy leftmost
  * non-overlapping rewrite) at ANY round count, and the full trainer must
  * not scale Spark jobs with R. */
class BpeTrainSpec extends AnyFunSuite {
  import operators.PipelineOps.{bpeTrainLocal, bpeMerges, BPE_MAX_TYPES}

  /** The naive reference: the exact algorithm of preflight.py's bpe_ref,
    * re-derived independently (full recount per round — O(R·dict), the
    * spec the incremental inverted-index trainer must match). */
  private def naive(dict: Seq[(Array[String], Long)], rounds: Int,
      mergeSym: (String, String) => String)
      : Seq[(Long, String, String, String, Long)] = {
    var seqs = dict.map { case (a, f) => (a.toSeq, f) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val pf = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (a, f) =>
        a.sliding(2).filter(_.size == 2).foreach { p =>
          pf.update((p(0), p(1)), pf.getOrElse((p(0), p(1)), 0L) + f)
        }
      }
      if (pf.isEmpty) done = true
      else {
        val maxF = pf.values.max
        // NB: .collect { case (p, f) ... => p } on a Map would rebuild a
        // Map[String, String] (p is a tuple) and silently collapse tie
        // candidates sharing a left symbol — filter().keys keeps the set.
        val (l, rr) = pf.filter(_._2 == maxF).keys.min
        out += ((r.toLong, l, rr, mergeSym(l, rr), maxF))
        val m = mergeSym(l, rr)
        seqs = seqs.map { case (a, f) =>
          val b = Seq.newBuilder[String]
          var i = 0
          while (i < a.length) {
            if (i + 1 < a.length && a(i) == l && a(i + 1) == rr) {
              b += m; i += 2
            } else { b += a(i); i += 1 }
          }
          (b.result(), f)
        }
      }
      r += 1
    }
    out.result()
  }

  private def chars(w: String): Array[String] = w.map(_.toString).toArray

  test("incremental trainer == naive greedy spec on random dicts, R=40") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val dict = (1 to 200).map { _ =>
        val len = 1 + rnd.nextInt(9)
        val w = (1 to len).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        (chars(w), (1 + rnd.nextInt(50)).toLong)
      }
      // collapse duplicate words like a groupBy would (freq summed)
      val merged = dict.groupBy(_._1.toSeq)
        .map { case (k, v) => (k.toArray, v.map(_._2).sum) }.toSeq
      val got = bpeTrainLocal(merged, rounds = 40, mergeSym = _ + _)
      val want = naive(merged, rounds = 40, mergeSym = _ + _)
      assert(got === want, s"trial $trial")
    }
  }

  test("overlapping pairs count per adjacency and merge greedily left-first") {
    // 'aaaa' (freq 3): pair (a,a) has 3 adjacencies × 3 = 9; greedy
    // rewrite gives [aa, aa]; round 2's (aa, aa) then merges to [aaaa].
    val dict = Seq((chars("aaaa"), 3L))
    val got = bpeTrainLocal(dict, rounds = 3, mergeSym = _ + _)
    assert(got === Seq(
      (1L, "a", "a", "aa", 9L),
      (2L, "aa", "aa", "aaaa", 3L)))
    // round 3 finds no pairs: the loop dries out instead of emitting
  }

  test("byte-mode mergeSym and multi-round chain") {
    val dict = Seq(
      ("104 101 108 108 111".split(" "), 10L), // 'hello' as bytes
      ("104 101 108 112".split(" "), 7L)) // 'help'
    val got = bpeTrainLocal(dict, rounds = 3, mergeSym = _ + "." + _)
    val want = naive(dict.map(d => (d._1, d._2)), 3, _ + "." + _)
    assert(got === want)
    // (104,101) and (101,108) tie at 17; ("101","108") is the
    // lexicographically smaller STRING pair ("101" < "104")
    assert(got.head._2 === "101" && got.head._3 === "108" &&
      got.head._4 === "101.108" && got.head._5 === 17L)
  }

  test("ties break to the lexicographically smallest (l, r)") {
    // (b,c) and (a,b) both freq 5 → (a,b) wins; then chain continues
    val dict = Seq((chars("abc"), 5L))
    val got = bpeTrainLocal(dict, rounds = 1, mergeSym = _ + _)
    assert(got === Seq((1L, "a", "b", "ab", 5L)))
  }

  test("trainer Spark-job count is independent of R (two jobs, not R)") {
    // The r11 weak shape was 1 + 2R jobs for R merges. Now: one dict agg
    // + one TakeOrdered collect, then a driver-local loop — so the job
    // count while training must be a small constant (AQE may stage-split
    // the agg; allow a small ceiling far below the old 17-for-8-rounds).
    val spark = TestSpark.spark
    val counter = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        counter.incrementAndGet(); ()
      }
    }
    // A FRESH memo key (the cache is keyed by dir string), so this is a
    // genuine training run even when another suite already trained on
    // TestSpark.sf in this JVM: copy the documents fixture to a temp dir.
    val tmp = java.nio.file.Files.createTempDirectory("bpe_jobs").toFile
    tmp.deleteOnExit()
    val src = new java.io.File(s"${TestSpark.sf}/documents.parquet")
    val dst = new java.io.File(tmp, "documents.parquet")
    java.nio.file.Files.copy(src.toPath, dst.toPath)
    // The listener bus is async: deterministically DRAIN it instead of a
    // fixed sleep (ADVICE r13 — a loaded host could undercount the first
    // read or leak late first-call events into the memoization check).
    // waitUntilEmpty is private[spark], reached reflectively like
    // Bench.drainListeners; the fallback polls the counter until it has
    // been stable for 500 ms (bounded), which is the same guarantee.
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch {
        case scala.util.control.NonFatal(_) =>
          val deadline = System.nanoTime() + 10_000_000_000L
          var last = counter.get()
          var stableSince = System.nanoTime()
          while (System.nanoTime() - stableSince < 500_000_000L &&
              System.nanoTime() < deadline) {
            Thread.sleep(50)
            val cur = counter.get()
            if (cur != last) { last = cur; stableSince = System.nanoTime() }
          }
      }
    spark.sparkContext.addSparkListener(listener)
    try {
      bpeMerges(spark, tmp.getAbsolutePath)
      drain()
      val afterFirst = counter.get()
      // memoized per (session, dir): a second call must add ZERO jobs
      bpeMerges(spark, tmp.getAbsolutePath)
      drain()
      assert(counter.get() === afterFirst,
        "memoized second training launched Spark jobs")
      // Why 6 is safe under AQE: the trainer submits exactly TWO actions
      // (dict hash-agg collect + TakeOrdered), and an AQE-wrapped action
      // can launch one job per materialized exchange stage plus the
      // final-stage job — the dict agg has one exchange (≤2 jobs + a
      // possible empty-stage job), TakeOrdered at most the same — so ≤6
      // covers every AQE staging variant while the old R-loop shape was
      // ≥17 (1 checkpoint + 8 argmax + 8 rewrites) and scales with R.
      assert(afterFirst >= 1 && afterFirst <= 6,
        s"training launched $afterFirst jobs — scales with R?")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("cap constant matches the preflight mirror") {
    val py = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("scripts/preflight.py")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(py.contains("BPE_MAX_TYPES = 1 << 20") && BPE_MAX_TYPES == (1 << 20),
      "BPE_MAX_TYPES drifted between PipelineOps and scripts/preflight.py")
  }
}
