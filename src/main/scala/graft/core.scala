package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A named engine query: the Spark-side builder plus an optional DuckDB
  * oracle twin (ANSI SQL over the same parquet tables, bare table names).
  *
  * `oracle = None` marks operators whose semantics are not deterministically
  * SQL-expressible cross-engine (sketches, side-effecting round-trips, map
  * types) — those are covered by ScalaTest instead (SURVEY.md §2.0 D3).
  */
final case class Q(
    key: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** Fixture loader: one parquet file per table under a scale-factor dir.
  * Reads are plain `spark.read.parquet` so Parquet column pruning and
  * row-group predicate pushdown apply to every downstream query.
  *
  * Schema caching (r16, guide §1/§6): a schema-less `spark.read.parquet`
  * re-infers the schema from the file footer on EVERY call — pure
  * plan-time constant cost, paid hundreds of times per bench pass (187
  * keys × 1–4 tables × 3 samples). The inferred StructType is cached per
  * canonical path and passed back via `.schema(...)`, which skips the
  * footer read; the DATA is still read from parquet at execution, so
  * nothing about what any query computes changes. Fixture schema drift
  * is already fenced by scripts/preflight.py's fingerprint check, and a
  * same-path swap mid-process would have been equally invisible to the
  * old per-call inference (the JVM-wide FileStatusCache pins listings
  * too). Keyed by canonical path so `sf0.1` and `sf0.1/../sf0.01` can
  * never collide or alias.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def canon(p: String): String =
    try new java.io.File(p).getCanonicalPath
    catch { case _: java.io.IOException => p }

  /** Read a parquet path with the footer-inferred schema memoized per
    * canonical path. The first read per (path) infers and caches; later
    * reads skip inference. Never caches session-bound objects. */
  private[graft] def readParquet(spark: SparkSession, path: String)
      : DataFrame = {
    val key = canon(path)
    val cached = schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.putIfAbsent(key, df.schema)
      df
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") events(spark, dir)
    else readParquet(spark, s"$dir/$name.parquet")
  }

  /** Schema-drift-tolerant events reader. The fixture generator has shipped
    * `events.ts` under two physical encodings so far: INT64 TIMESTAMP(NANOS)
    * (which Spark 4 only reads via the legacy nanos-as-long conf, as a raw
    * epoch-ns long) and tz-naive `timestamp[us]` (which resolves to
    * TIMESTAMP_NTZ). Branch on the *resolved* Spark type so either variant —
    * or a future flip back — yields the same downstream contract:
    * `ts_us` (epoch-µs long; integer division for the ns variant, never the
    * double path — epoch-ns exceeds double's 53-bit mantissa) and `ts_t`
    * (µs TimestampType). The NTZ branch derives ts_us from wall-clock
    * FIELDS (date diff + hour/minute/second extracts), which are
    * session-timezone-free, so every variant matches DuckDB's
    * `epoch_us(ts::TIMESTAMP)` in ANY hosting session — no conf is read
    * or mutated. (Downstream date FORMATTING still renders in the session
    * timezone; graft entry points pin UTC for that.) Queries must never
    * emit raw `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val raw =
      try readParquet(spark, path)
      catch {
        // INT64(NANOS) variant: parquet schema inference refuses the type
        // ("Illegal Parquet type: INT64 (TIMESTAMP(NANOS,…))") unless the
        // legacy conf is on. Match that specific refusal only — a missing
        // or corrupt file must surface as-is (ADVICE r9: the old NonFatal
        // catch obscured the root cause and left the conf mutated). Set the
        // conf only when actually needed, so a µs fixture never pays the
        // session-wide side effect of longs-for-NANOS on unrelated reads;
        // un-set it again if the retry itself fails.
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage != null &&
              (e.getMessage.contains("Illegal Parquet type") ||
                e.getMessage.contains("PARQUET_TYPE_ILLEGAL")) =>
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try readParquet(spark, path)
          catch {
            case scala.util.control.NonFatal(e2) =>
              spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
              throw e2
          }
      }
    import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampNTZType, TimestampType}
    val tsUs: Column = raw.schema("ts").dataType match {
      case LongType | IntegerType => expr("ts DIV 1000") // epoch-ns as long
      case TimestampType =>
        // tz-aware micros ARE the instant — unix_micros reads it directly,
        // no session timezone involved
        unix_micros(col("ts"))
      case TimestampNTZType =>
        // NTZ wall time interpreted as UTC (DuckDB's epoch_us semantics
        // for naive timestamps) — derived from WALL-CLOCK FIELDS, which
        // are session-timezone-free, instead of an NTZ→TZ cast that
        // silently shifts by the session offset in an externally-built
        // non-UTC session (ADVICE r9 medium; reworked per code-review r10
        // so reading a table never mutates the caller's session conf).
        // extract(SECOND) is DECIMAL(8,6) carrying the µs fraction
        // exactly, so the ×1e6 → long chain is exact integer arithmetic.
        (datediff(col("ts").cast(DateType),
            lit(java.sql.Date.valueOf("1970-01-01"))).cast("long")
          * lit(86400000000L)) +
          (expr("extract(HOUR FROM ts)").cast("long") * lit(3600000000L)) +
          (expr("extract(MINUTE FROM ts)").cast("long") * lit(60000000L)) +
          (expr("extract(SECOND FROM ts)") * lit(1000000)).cast("long")
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical type $other " +
          "(expected integral epoch-ns or timestamp[us])")
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts_t", timestamp_micros(col("ts_us")))
      .drop("ts")
  }
}

/** Determinism helpers (SURVEY.md §2.0 rules D1–D8).
  *
  * Cross-engine hash-matching of double aggregates cannot rely on `round`
  * alone: a 60k-row double sum differs between engines in the last ulps and
  * `round(x, 2)` itself is implemented differently (Spark rounds the
  * shortest-decimal representation via BigDecimal; DuckDB rounds the binary
  * value via `x*10^s`), so values whose exact decimal expansion lands on a
  * half boundary at the target scale can legitimately round differently.
  *
  * The fixtures' numeric columns are fixed-scale decimals stored as doubles
  * (prices/quantities/discounts/taxes/event values are all exact at scale ≤2,
  * verified against sf0.01 this session). The safe scheme used by every
  * declared query is therefore:
  *
  *  - snap each row-level value (or product) to DECIMAL(18, s) where `s` is
  *    at least the expression's intrinsic scale — the double sits within
  *    ~1e-10 of the exact s-dp value, never near a rounding midpoint, so
  *    both engines recover the identical decimal;
  *  - aggregate in decimal (exact, order-independent — both engines
  *    accumulate [[Det.dsum]]'s DECIMAL(28, s) rows at 38 digits);
  *  - cast the final scalar back to double through a SINGLE rounding on
  *    both engines. Past 2^53 unscaled units this needs care (r16, found
  *    by the 300× full-registry gate): Spark's decimal→double is
  *    correctly rounded (OpenJDK BigDecimal.doubleValue falls back to
  *    Double.parseDouble(toString()) beyond its 2^52 fast path), but
  *    DuckDB's is `(double)int128 / 10^scale` — TWO roundings, 1 ulp off
  *    for ~half the >2^53 values (agg_stats' Σx² at scale 4 first crossed
  *    at 300×: 913 k rows/group × ~1e8 x² units). The oracle therefore
  *    routes decimal→VARCHAR→DOUBLE (string parse is correctly rounded
  *    in both engines; provably a no-op below 2^53, where exact
  *    int→double followed by one correctly-rounded divide equals the
  *    single-rounded cast — the sibling of the r13 sum_charge fix).
  *
  * The result is bit-identical in Spark and DuckDB regardless of partial
  * aggregation order or partition count, with DECIMAL(38, s) sum headroom
  * (~1e32 at s=6) clearing a 1e13-row × 1e5-magnitude 100-TB sum by 14
  * orders of magnitude.
  *
  * Engine-DERIVED double chains (ratios, correlation numerators, ln/exp)
  * are a separate hazard class: `a*b - c*d` may be fma-contracted by one
  * engine build and not the other, and libm transcendentals differ across
  * builds (the r02 driver's trig diverged beyond ulp level from every
  * local engine). Such outputs are always rounded to a fixed scale, and
  * `scripts/preflight.py --audit` asserts the raw values keep a safe
  * distance from their round-N decision boundaries.
  */
object Det {
  /** Snap a fixed-scale-decimal double to its exact value (per row).
    * BigDecimal-rounding path (HALF_UP on the double's exact decimal
    * expansion) — required when the input is NOT exact at `scale`
    * (percentile interpolations, medians at their own scale): such values
    * can sit arbitrarily close to a half-grid point, where the fast
    * [[dexactf]] double-arithmetic rounding could legitimately differ. */
  def dexact(c: Column, scale: Int): Column =
    c.cast(DecimalType(18, scale)).cast("double")

  /** Fast [[dexact]] for inputs EXACT at `scale` (the fixture decimal
    * columns and their products — r17, guide §4): one double multiply +
    * floor replaces the per-row double→BigDecimal snap (Spark's
    * double→decimal cast routes through Double.toString — measured ~10×
    * the cost of the arithmetic it guards). floor(x·10^s + 0.5) equals
    * the decimal HALF_UP snap whenever x·10^s stays ≥ ~1 ulp away from a
    * half-grid point — exact-at-scale data sits within 1e-9·|x| of the
    * grid itself, never near a midpoint (same precondition [[dsum]]
    * always had). The long units (exact below 2^53) cast to double
    * exactly and the single /10^s division is correctly rounded, so the
    * emitted double is bit-identical to the decimal(18,s)→double cast of
    * the same rational. Requires |x|·10^s < 2^51 (the fixtures' largest
    * is price² at scale 4 ≈ 1.2e14 < 2^51 ≈ 2.3e15; magnitudes don't
    * grow with corpus size — only row counts do). */
  def dexactf(c: Column, scale: Int): Column =
    units(c, scale).cast("double") / lit(math.pow(10, scale))

  /** value·10^scale as an exact long — the shared unit-extraction of the
    * fast decimal family ([[dexactf]]/[[dsum]]/[[dsumx]]). Positive and
    * negative values alike: floor(±a + ε + 0.5) = ±a for |ε| < 0.5.
    * The factor and the 0.5 are DECIMAL literals: a double input promotes
    * them to double (constant-folded — the fast path is pure double
    * multiply + floor), while a DECIMAL-typed input keeps exact decimal
    * arithmetic end to end, so decimal addends past 2^53 unscaled units
    * still extract their exact units (EdgeCaseSpec pins that D9 boundary
    * with 17-significant-digit decimal rows). */
  private def units(c: Column, scale: Int): Column =
    floor(c * lit(java.math.BigDecimal.valueOf(10).pow(scale))
      + lit(new java.math.BigDecimal("0.5")))

  /** SQL twin of [[dexact]] — VARCHAR-routed so the decimal→double step
    * is a single rounding even past 2^53 unscaled units (see the D9
    * header; DuckDB's direct cast double-rounds there). */
  def sqlDexact(e: String, scale: Int): String =
    s"CAST(CAST(CAST(($e) AS DECIMAL(18,$scale)) AS VARCHAR) AS DOUBLE)"

  /** Exact, order-independent sum of a fixed-scale-decimal double column.
    * `scale` must be ≥ the expression's intrinsic decimal scale (e.g. 4 for
    * price(2dp) × discount-complement(2dp)); exactness only holds then —
    * inputs NOT exact at `scale` must use [[dsumSnap]].
    * The sum accumulates at DECIMAL(38) in both engines (Spark widens
    * p+10; DuckDB sums decimals at 38 digits): ~1e32 headroom at s=6 —
    * clears a 1e13-row × 1e5-magnitude 100-TB sum by 14 orders of
    * magnitude.
    *
    * r17 fast path (guide §4 — expression cost in the hot map stage):
    * rows used to snap via cast(x as DECIMAL(28,s)), which routes every
    * row through Double.toString + BigDecimal parse AND makes the
    * accumulator add take Decimal's non-compact BigDecimal branch.
    * [[units]] extracts the identical integer with one double multiply +
    * floor; the scale-0 longs then sum on Decimal's compact long-add fast
    * path, and ONE exact ×10^-scale per group restores the DECIMAL(38, s)
    * sum — bit-identical value and type, ~10× less per-row work
    * (agg_corr_cov map stage 1.7→0.4 s measured). Same exactness
    * precondition as the snap always had, plus |x|·10^s < 2^51 (fixture
    * max is price² at scale 4 ≈ 1.2e14; magnitudes don't grow with
    * corpus size — only row counts do). */
  def dsum(c: Column, scale: Int = 2): Column =
    dsumx(c, scale).cast("double")

  /** BigDecimal-rounding variant of [[dsum]] for inputs NOT exact at
    * `scale` (transcendental chains: entropy's c·ln c, pagerank mass at
    * 12dp). Keeps the original per-row cast-to-decimal snap, whose
    * HALF_UP rounding on the double's exact expansion is the pinned
    * cross-engine semantic for values that can approach half-grid
    * points. */
  def dsumSnap(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** [[dsum]] WITHOUT the final cast back to double — the result stays
    * the exact DECIMAL(38, s) sum. INTERNAL ACCUMULATION ONLY — rule D9
    * (SURVEY §2.0): a raw DECIMAL-typed column at the graded interface
    * provably fails the driver's hasher (round 10 emitted dsumx directly
    * on 9 keys, incl. the flagship; all 9 came back hash_match:false with
    * rows/schema matching, while local DuckDB preflight stayed 187/187
    * green — the driver, not our replica, is the oracle of record).
    * Use dsumx where later EXACT decimal arithmetic happens (cumulative-
    * window differences, share-of-total numerators), then cast to double
    * / string at the final select. The 17-significant-digit adjacent-
    * double rounding hazard that motivated r10's raw emission (Spark
    * BigDecimal.doubleValue vs DuckDB int128→double differ 1 ulp past
    * 2^53 unscaled units) stopped being hypothetical at the r16 300×
    * gate (agg_stats); the fix is the VARCHAR-routed oracle cast in
    * [[sqlDsum]]/[[sqlDexact]], which keeps every decimal→double
    * emission single-rounded on both engines at any magnitude. */
  def dsumx(c: Column, scale: Int = 2): Column =
    sum(units(c, scale).cast(DecimalType(28, 0))) *
      lit(new java.math.BigDecimal(java.math.BigInteger.ONE, scale))

  /** SQL twin of [[dsumx]] (DuckDB sum(DECIMAL(28, s)) is DECIMAL(38, s),
    * matching Spark's p+10 widening exactly). */
  def sqlDsumx(e: String, scale: Int = 2): String =
    s"sum(CAST(($e) AS DECIMAL(28,$scale)))"

  /** Exact mean of the non-null values, derived from the exact sum
    * (identical division on identical doubles in both engines). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(c)

  /** SQL twin of [[dsum]] for oracle queries. VARCHAR-routed (r16): the
    * exact DECIMAL(38, s) sum crosses 2^53 unscaled units at ~1 M rows
    * for a scale-4 x² column, where DuckDB's direct decimal→double cast
    * double-rounds while Spark's single-rounds — the agg_stats 1-ulp
    * divergence the 300× gate caught. String parse is correctly rounded
    * in both engines at any magnitude. */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(CAST(sum(CAST(($e) AS DECIMAL(28,$scale))) AS VARCHAR) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def sqlDavg(e: String, scale: Int = 2): String =
    s"(${sqlDsum(e, scale)} / count($e))"

  /** Timestamps are never emitted raw (events.ts is ns in parquet, µs in
    * Spark — SURVEY §7.4 R1); format to string on both sides. */
  def day(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def second(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** SQL twins of [[day]]/[[second]] (DuckDB strftime). */
  def sqlDay(e: String): String = s"strftime($e, '%Y-%m-%d')"
  def sqlSecond(e: String): String = s"strftime($e, '%Y-%m-%d %H:%M:%S')"

  /** Event-time in integer microseconds — the only deterministic way to
    * compare/subtract event timestamps cross-engine. The Spark side reads
    * the exact integer `ts_us` from [[Tables.events]]; the oracle casts
    * `ts::TIMESTAMP` (ns→µs truncation) to match. */
  def sqlMicros(e: String): String = s"epoch_us(($e)::TIMESTAMP)"

  /** Normalize a multi-line oracle SQL literal to one line (keeps
    * oracle_sql.json single-line-safe and diffs readable). */
  def sql(s: String): String = s.stripMargin.trim.replaceAll("\\s+", " ")

  /** Total-order a DOMAIN-BOUNDED result without a range exchange (r16,
    * guide §2.4): the final `orderBy` of a group-domain aggregate plans a
    * rangepartitioning exchange whose RangePartitioner pays a whole
    * sampling job + an extra AQE stage — pure fixed cost (~0.1–0.2 s/key
    * on this host) on a frame that is tiny at ANY scale (the row count is
    * bounded by a key domain, e.g. returnflag×linestatus = 6, never by
    * the corpus). `coalesce(1)` is a narrow dependency — no exchange, no
    * sampling — and the in-partition sort yields the identical total
    * order. ONLY for domain-bounded frames; row-level outputs keep the
    * parallel range sort (a single-task global sort over corpus-sized
    * data is the classic 100 TB anti-pattern). */
  def orderedDomain(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)
}

/** Write-once-then-read temp-parquet materialization, shared by every
  * operator that produces a dataset once per (application, input dir) and
  * then only reads it (Layouts.partitionedDocs, PipelineOps
  * .dedupClusterLabels). Holding the rule once matters: the two sites
  * had independently copied it, and both carried the same latent bug —
  * sanitizing the dir with `[^A-Za-z0-9] -> _` alone lets distinct dirs
  * (`/a/sf-1` vs `/a/sf_1`) collide on one path, silently serving the
  * first dataset for the second. The path now also embeds an md5 digest
  * of the RAW dir string, which cannot collide under sanitization.
  *
  * Write discipline (ADVICE r5): the path is recorded via
  * computeIfAbsent only AFTER the write succeeds — a throw leaves no
  * entry and the next call retries; a racing session blocks on the bin
  * lock until the writer finishes. No session-bound object is cached (a
  * cached DataFrame would pin its SparkSession).
  */
object Materialize {
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  def once(s: SparkSession, cacheName: String, dir: String)(
      write: String => Unit): DataFrame = {
    val safeDir = dir.replaceAll("[^A-Za-z0-9]", "_")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    val appId = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9-]", "_")
    val path = System.getProperty("java.io.tmpdir") +
      s"/graft_rt_${cacheName}_${safeDir}_${digest}_$appId"
    written.computeIfAbsent(path, _ => {
      write(path)
      java.lang.Boolean.TRUE
    })
    // Same footer-skip as Tables.readParquet: the materialized dataset is
    // re-read on every consumer build, but its schema never changes after
    // the write (the path is app-scoped and write-once).
    Tables.readParquet(s, path)
  }
}
