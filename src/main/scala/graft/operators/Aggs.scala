package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.1-D — aggregations (SURVEY.md:201-212).
  *
  * Every double aggregate goes through [[Det.dsum]]/[[Det.davg]] (exact
  * decimal accumulation → order-independent, partition-count-independent —
  * the property that makes these plans safe on a 1000-executor cluster, not
  * just hash-matchable). Hash aggregation is Spark's default physical
  * strategy here: partial (map-side) agg → shuffle on the group keys →
  * final agg, so the shuffle carries one row per (partition × group), not
  * per input row.
  */
object Aggs {
  import Det._

  /** TPC-H Q1 pricing summary — also the flagship [[graft.SparkEntry.entry]]. */
  def q1(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.table(s, dir, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
    val discPrice = col("l_extendedprice") * (lit(1) - col("l_discount"))
    val charge = discPrice * (lit(1) + col("l_tax"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        // Sums accumulate as exact decimals and are EMITTED as doubles
        // (dsum) — determinism rule D9 (SURVEY §2.0): raw DECIMAL(38,s)
        // output columns provably fail the driver's hasher (r10 lost 9
        // keys including this flagship to dsumx emission, CORRECTNESS_r10).
        // Double emission is exact at every driver-graded SF (sf0.01 sums
        // need ≤12 significant digits). sum_charge is the one column whose
        // grown-corpus sums cross double's 15 exact digits (the 1-ulp
        // adjacent-double boundary at ≥~6M-row sums), so it emits as a
        // fixed-scale STRING — exact at ANY scale. The representation is
        // driver-PROVEN: the r12 canary_string_sum probe (below) came back
        // hash-green (CORRECTNESS_r12), per the §7.3.1 protocol.
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(discPrice, 4).as("sum_disc_price"),
        dsumx(charge, 6).cast("string").as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        davg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .transform(df => orderedDomain(df,
        col("l_returnflag"), col("l_linestatus")))
  }

  val q1Oracle: String = sql(s"""
    |SELECT l_returnflag, l_linestatus,
    |  ${sqlDsum("l_quantity", 2)} AS sum_qty,
    |  ${sqlDsum("l_extendedprice", 2)} AS sum_base_price,
    |  ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
    |  CAST(${sqlDsumx("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS VARCHAR) AS sum_charge,
    |  ${sqlDavg("l_quantity", 2)} AS avg_qty,
    |  ${sqlDavg("l_extendedprice", 2)} AS avg_price,
    |  ${sqlDavg("l_discount", 2)} AS avg_disc,
    |  count(*)::BIGINT AS count_order
    |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    |GROUP BY l_returnflag, l_linestatus
    |ORDER BY l_returnflag, l_linestatus""")

  val qs: Seq[Q] = Seq(
    Q("agg_hash_groupby", q1 _, Some(q1Oracle)),

    Q("agg_count_distinct",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("distinct_customers"),
          countDistinct(col("o_orderstatus")).as("distinct_statuses"))
        .orderBy(col("o_orderpriority")),
      Some(sql("""SELECT o_orderpriority,
        |count(DISTINCT o_custkey)::BIGINT AS distinct_customers,
        |count(DISTINCT o_orderstatus)::BIGINT AS distinct_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))),

    // HLL sketch values differ across engines → no oracle (D3); the exact
    // twin is agg_count_distinct above. Still graded rows-only + benched.
    Q("agg_approx_distinct",
      (s, dir) => Tables.table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02)
          .as("approx_users"))
        .transform(df => orderedDomain(df, col("event_type"))),
      None),

    // Mergeable-sketch shard pattern: one DataSketches HLL per source
    // shard, then a register-max union — THE shape a 100-TB distinct
    // count runs in (each shard sketches locally, only KB-sized sketches
    // move; re-aggregation is union, never a recount). The __ALL__ row's
    // estimate comes from hll_union_agg over the per-shard sketches;
    // InvariantSpec proves it equals the direct whole-corpus sketch
    // estimate bit-for-bit (union of partials ≡ sketch of whole — the
    // mergeability contract) and that per-shard estimates track exact
    // counts within HLL error. Sketch bytes are engine-specific → no
    // DuckDB oracle (D3); the exact twin is agg_count_distinct.
    Q("agg_hll_merge",
      (s, dir) => {
        val tok = Tables.table(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
        val per = tok.groupBy(col("source"))
          .agg(hll_sketch_agg(col("word")).as("sk"),
            countDistinct(col("word")).as("exact_distinct"))
        val merged = per
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
          .crossJoin(broadcast(
            tok.agg(countDistinct(col("word")).as("exact_distinct"))))
          .select(lit("__ALL__").as("source"), col("exact_distinct"),
            col("est").as("hll_est"))
        per.select(col("source"), col("exact_distinct"),
            hll_sketch_estimate(col("sk")).as("hll_est"))
          .unionByName(merged)
          .transform(df => orderedDomain(df, col("source")))
      },
      None),

    // The exact half of agg_hll_merge, hash-checked (VERDICT r6 task 4):
    // per-shard exact distinct words plus the whole-corpus __ALL__ row —
    // the ground truth the sketch estimates are graded against in
    // InvariantSpec. Splitting it out gives the shard-distinct frame a
    // driver-side oracle while the engine-specific sketch bytes stay
    // rows-only above.
    Q("agg_hll_merge_exact",
      (s, dir) => {
        // dedupe to (source, word) ONCE — both branches then aggregate
        // the small deduped frame instead of re-tokenizing the corpus
        // (review r7: the naive two-branch union scanned documents twice)
        val sw = Tables.table(s, dir, "documents")
          .select(col("source"), explode(split(col("text"), " ")).as("word"))
          .distinct()
        sw.groupBy(col("source"))
          .agg(count(col("word")).as("exact_distinct"))
          .unionByName(sw
            .agg(countDistinct(col("word")).as("exact_distinct"))
            .select(lit("__ALL__").as("source"), col("exact_distinct")))
          .transform(df => orderedDomain(df, col("source")))
      },
      Some(sql("""WITH sw AS (
        |  SELECT DISTINCT source, word FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS word
        |    FROM documents))
        |SELECT source, count(word)::BIGINT AS exact_distinct
        |FROM sw GROUP BY source
        |UNION ALL
        |SELECT '__ALL__' AS source, count(DISTINCT word)::BIGINT
        |FROM sw
        |ORDER BY source"""))),

    Q("agg_filtered",
      (s, dir) => Tables.table(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(
          sum(when(col("s_acctbal") > 0, 1L).otherwise(0L)).as("cnt_pos"),
          sum(when(col("s_acctbal") <= 0, 1L).otherwise(0L)).as("cnt_nonpos"),
          count(lit(1)).as("cnt_total"))
        .orderBy(col("s_nationkey")),
      Some(sql("""SELECT s_nationkey,
        |count(*) FILTER (WHERE s_acctbal > 0)::BIGINT AS cnt_pos,
        |count(*) FILTER (WHERE s_acctbal <= 0)::BIGINT AS cnt_nonpos,
        |count(*)::BIGINT AS cnt_total
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))),

    // var/stddev from exact decimal sums (sum-of-squares formula) so the
    // result is bit-identical cross-engine; builtin stddev's accumulation
    // order would not be. median of 2dp values snaps exactly at scale 3.
    Q("agg_stats",
      (s, dir) => {
        val c = Tables.table(s, dir, "customer")
        val n = count(lit(1))
        val s1 = dsum(col("c_acctbal"), 2)
        val s2 = dsum(col("c_acctbal") * col("c_acctbal"), 4)
        c.groupBy(col("c_mktsegment"))
          .agg(
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            ((s2 - s1 * s1 / n) / (n - lit(1))).as("var_bal"),
            sqrt((s2 - s1 * s1 / n) / (n - lit(1))).as("stddev_bal"),
            dexact(median(col("c_acctbal")), 3).as("median_bal"),
            n.as("cnt"))
          .orderBy(col("c_mktsegment"))
      },
      Some(sql(s"""SELECT c_mktsegment,
        |min(c_acctbal) AS min_bal, max(c_acctbal) AS max_bal,
        |((${sqlDsum("c_acctbal * c_acctbal", 4)} -
        |  ${sqlDsum("c_acctbal", 2)} * ${sqlDsum("c_acctbal", 2)} / count(*))
        | / (count(*) - 1)) AS var_bal,
        |sqrt((${sqlDsum("c_acctbal * c_acctbal", 4)} -
        |  ${sqlDsum("c_acctbal", 2)} * ${sqlDsum("c_acctbal", 2)} / count(*))
        | / (count(*) - 1)) AS stddev_bal,
        |${sqlDexact("median(c_acctbal)", 3)} AS median_bal,
        |count(*)::BIGINT AS cnt
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment"""))),

    // Higher moments — skewness and excess kurtosis — from EXACT power
    // sums computed entirely in decimal arithmetic. Snapping the DOUBLE
    // powers x³/x⁴ to a decimal (the agg_stats pattern) would NOT be
    // exact here: x³ at 6 dp needs ~19 significant digits, past double's
    // shortest-repr 17, so Spark (BigDecimal of the shortest repr) and
    // DuckDB (int128 scaling of the exact binary value) could snap the
    // SAME double to adjacent decimals (code-review r10). Instead the
    // 2-dp input is recovered as an exact DECIMAL(8,2) — its double is
    // within ~1 e-12 of the 1 e-2 grid point, so the cast is exact and
    // identical in both engines — and the powers are DECIMAL products:
    // (8,2)→(·,4)→(·,6)→(·,8), every cell exact, every sum exact and
    // order-independent at any corpus size (DECIMAL(38,8) carries
    // 10³⁰ units — 10¹³ rows × |x|⁴ ≤ 10¹⁶ fits). Only the moment
    // FORMULAS run in doubles, the same scalar IEEE chain on both
    // engines. m2^1.5 is written as m2·sqrt(m2) — sqrt and multiply are
    // correctly rounded, libm pow is NOT (the scalar_trig lesson). One
    // map-side-partial aggregate; domain-sized output. Rounded at 6
    // with a preflight boundary audit.
    Q("agg_skew_kurt",
      (s, dir) => {
        val c = Tables.table(s, dir, "customer")
        val xd = col("c_acctbal").cast(DecimalType(8, 2))
        val n = count(lit(1)).cast("double")
        val s1 = sum(xd).cast("double")
        val s2 = sum(xd * xd).cast("double")
        val s3 = sum(xd * xd * xd).cast("double")
        val s4 = sum(xd * xd * xd * xd).cast("double")
        val mu = s1 / n
        val m2 = s2 / n - mu * mu
        val m3 = (s3 / n - lit(3.0) * mu * (s2 / n)) +
          lit(2.0) * mu * mu * mu
        val m4 = (s4 / n - lit(4.0) * mu * (s3 / n)) +
          lit(6.0) * mu * mu * (s2 / n) - lit(3.0) * mu * mu * mu * mu
        c.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("cnt"),
            round(m3 / (m2 * sqrt(m2)), 6).as("skew_r6"),
            round(m4 / (m2 * m2) - lit(3.0), 6).as("kurt_r6"))
          .orderBy(col("c_mktsegment"))
      },
      Some {
        // DuckDB's 4-fold product overflows its int64 intermediate, so
        // the oracle widens x² explicitly; DECIMAL(20,4) holds x² exactly
        // and exact·exact = exact, so both engines' (differently-staged)
        // decimal chains produce the IDENTICAL exact power sums.
        val xd = "CAST(c_acctbal AS DECIMAL(8,2))"
        val x2 = s"CAST($xd * $xd AS DECIMAL(20,4))"
        val n = "CAST(count(*) AS DOUBLE)"
        val s1 = s"CAST(sum($xd) AS DOUBLE)"
        val s2 = s"CAST(sum($x2) AS DOUBLE)"
        val s3 = s"CAST(sum($x2 * $xd) AS DOUBLE)"
        val s4 = s"CAST(sum($x2 * $x2) AS DOUBLE)"
        val mu = s"($s1 / $n)"
        val m2 = s"($s2 / $n - $mu * $mu)"
        val m3 = s"($s3 / $n - CAST(3 AS DOUBLE) * $mu * ($s2 / $n)" +
          s" + CAST(2 AS DOUBLE) * $mu * $mu * $mu)"
        val m4 = s"($s4 / $n - CAST(4 AS DOUBLE) * $mu * ($s3 / $n)" +
          s" + CAST(6 AS DOUBLE) * $mu * $mu * ($s2 / $n)" +
          s" - CAST(3 AS DOUBLE) * $mu * $mu * $mu * $mu)"
        sql(s"""SELECT c_mktsegment, count(*)::BIGINT AS cnt,
          |round($m3 / ($m2 * sqrt($m2)), 6) AS skew_r6,
          |round($m4 / ($m2 * $m2) - CAST(3 AS DOUBLE), 6) AS kurt_r6
          |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")
      }),

    // Quantile sketches differ across engines → no oracle (D3); the exact
    // twin is agg_stats' median.
    Q("agg_percentile_approx",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
            .as("p50_approx"),
          percentile_approx(col("o_totalprice"), lit(0.95), lit(10000))
            .as("p95_approx"))
        .orderBy(col("o_orderstatus")),
      None),

    // EXACT percentiles — the oracle-checked twin of agg_percentile_approx
    // (the approx key is rows-only by D3; this pins the family's algebra).
    // Spark `percentile` aggregates an exact value→count map then
    // interpolates at rank (n-1)·p; DuckDB `quantile_cont` uses the same
    // continuous-rank definition. Determinism: p ∈ {.25,.5,.75} are exact
    // binary rationals, so rank and interpolation fraction are identical
    // doubles in both engines, and o_totalprice is a 2-dp decimal stored
    // as double — the interpolated true value is exact at scale 4 while
    // each engine's formula (a·(1−f)+b·f vs a+(b−a)·f) lands within ulps
    // of it, so the DECIMAL(18,4) snap recovers the identical value.
    // Scale shape: the exact percentile map is O(distinct values) per
    // group partial-aggregated map-side — fine for bounded-cardinality
    // measures like prices; for unbounded doubles at 100 TB the approx
    // (KLL-sketch) key is the right tool, which is why both exist.
    Q("agg_percentile_exact",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          dexact(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
          dexact(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          dexact(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"),
          count(lit(1)).as("cnt"))
        .orderBy(col("o_orderstatus")),
      Some(sql(s"""SELECT o_orderstatus,
        |${sqlDexact("quantile_cont(o_totalprice, 0.25)", 4)} AS p25,
        |${sqlDexact("quantile_cont(o_totalprice, 0.5)", 4)} AS p50,
        |${sqlDexact("quantile_cont(o_totalprice, 0.75)", 4)} AS p75,
        |count(*)::BIGINT AS cnt
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))),

    Q("agg_rollup",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val sup = Tables.table(s, dir, "supplier")
        val nat = Tables.table(s, dir, "nation")
        val reg = Tables.table(s, dir, "region")
        // Two-level rollup (r16, guide §2.3 "aggregate before you
        // shuffle"): `rollup` plans an Expand that REPLAYS every fact row
        // once per grouping set, so the map side paid 3× the decimal
        // accumulation (measured ~1.8 s single-task at sf0.1 — fixture
        // files are one split). Aggregate at the finest grain first
        // (domain-sized: regions × nations), then roll the exact
        // DECIMAL(38,4) partials up — decimal addition is exact and
        // order-independent, so the grand totals are bit-identical to the
        // single-level form (D9: the double cast happens once, at the
        // end). At 100 TB this is strictly less map-side work and a 3×
        // smaller pre-exchange row stream for one extra ~30-row exchange.
        val base = li
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(dsumx(col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
            .as("rev_part"),
            count(lit(1)).as("cnt_part"))
        base.rollup(col("r_name"), col("n_name"))
          .agg(sum(col("rev_part")).cast("double").as("revenue"),
            sum(col("cnt_part")).as("cnt"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("revenue"), col("cnt"))
          .transform(df => orderedDomain(df,
            col("region_name"), col("nation_name")))
      },
      Some(sql(s"""SELECT coalesce(r_name, 'ALL') AS region_name,
        |coalesce(n_name, 'ALL') AS nation_name,
        |${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
        |count(*)::BIGINT AS cnt
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name"""))),

    Q("agg_cube",
      (s, dir) => {
        // Two-level cube — same restructure (and argument) as agg_rollup:
        // cube's Expand replays every order row ×4 grouping sets; the
        // finest grain (status × priority, ≤15 combos) aggregates once
        // and the cube re-aggregates the exact decimal partials.
        val base = Tables.table(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt_part"),
            dsumx(col("o_totalprice"), 2).as("tp_part"))
        base.cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(sum(col("cnt_part")).as("cnt"),
            sum(col("tp_part")).cast("double").as("total_price"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("cnt"), col("total_price"))
          .transform(df => orderedDomain(df,
            col("status"), col("priority")))
      },
      Some(sql(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*)::BIGINT AS cnt,
        |${sqlDsum("o_totalprice", 2)} AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY status, priority"""))),

    Q("agg_grouping_sets",
      (s, dir) => {
        Tables.table(s, dir, "orders").createOrReplaceTempView("gs_orders_v")
        s.sql(s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |coalesce(o_orderpriority, 'ALL') AS priority,
          |count(*) AS cnt
          |FROM gs_orders_v
          |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          |ORDER BY status, priority""".stripMargin)
      },
      Some(sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |coalesce(o_orderpriority, 'ALL') AS priority,
        |count(*)::BIGINT AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority"""))),

    // Boolean aggregates: universal/existential predicates per group.
    Q("agg_bool",
      (s, dir) => Tables.table(s, dir, "supplier")
        .groupBy(col("s_nationkey"))
        .agg(expr("bool_and(s_acctbal > 0)").as("all_positive"),
          expr("bool_or(s_acctbal < 0)").as("any_negative"),
          count(lit(1)).as("cnt"))
        .orderBy(col("s_nationkey")),
      Some(sql("""SELECT s_nationkey,
        |bool_and(s_acctbal > 0) AS all_positive,
        |bool_or(s_acctbal < 0) AS any_negative,
        |count(*)::BIGINT AS cnt
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey"""))),

    // Fixed-width histogram of order values (bucket = 25k): integer
    // bucketing on both engines (floor semantics identical for positives).
    Q("agg_histogram",
      // explicit floor on both sides: DuckDB's double->BIGINT cast ROUNDS
      // while Spark's truncates — floor is the common semantic
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(floor(col("o_totalprice") / 25000).as("price_bucket"))
        .agg(count(lit(1)).as("cnt"),
          dsum(col("o_totalprice"), 2).as("bucket_total"))
        .orderBy(col("price_bucket")),
      Some(sql(s"""SELECT CAST(floor(o_totalprice / 25000) AS BIGINT)
        |  AS price_bucket,
        |count(*)::BIGINT AS cnt,
        |${sqlDsum("o_totalprice", 2)} AS bucket_total
        |FROM orders GROUP BY CAST(floor(o_totalprice / 25000) AS BIGINT)
        |ORDER BY price_bucket"""))),

    // Weighted mean (price weighted by quantity) from exact decimal sums.
    Q("agg_weighted_avg",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((dsum(col("l_extendedprice") * col("l_quantity"), 4)
          / dsum(col("l_quantity"), 2)).as("qty_weighted_price"),
          dsum(col("l_quantity"), 2).as("total_qty"))
        .transform(df => orderedDomain(df,
          col("l_returnflag"), col("l_linestatus"))),
      Some(sql(s"""SELECT l_returnflag, l_linestatus,
        |(${sqlDsum("l_extendedprice * l_quantity", 4)}
        | / ${sqlDsum("l_quantity", 2)}) AS qty_weighted_price,
        |${sqlDsum("l_quantity", 2)} AS total_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus"""))),

    // Pearson correlation + sample covariance from exact decimal sums —
    // same order-independence argument as agg_stats' variance (builtin
    // corr/covar accumulate doubles in partition order and would not
    // hash-match). The sums themselves are bit-identical cross-engine, but
    // the derived `a*b - c*d` chains are NOT: a compiler may contract them
    // to fma (observed: 1-ulp corr divergence vs DuckDB at sf0.001), so
    // the derived outputs are rounded (8dp, boundary-audited in preflight)
    // like every other engine-computed double chain.
    Q("agg_corr_cov",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
        val n = count(lit(1))
        val sx = dsum(col("l_quantity"), 2)
        val sy = dsum(col("l_extendedprice"), 2)
        val sxx = dsum(col("l_quantity") * col("l_quantity"), 4)
        val syy = dsum(col("l_extendedprice") * col("l_extendedprice"), 4)
        val sxy = dsum(col("l_quantity") * col("l_extendedprice"), 4)
        li.groupBy(col("l_returnflag"))
          .agg(n.as("cnt"),
            round((sxy - sx * sy / n) / (n - lit(1)), 8)
              .as("cov_qty_price"),
            round((n * sxy - sx * sy)
              / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 8)
              .as("corr_qty_price"))
          .transform(df => orderedDomain(df, col("l_returnflag")))
      },
      Some(sql(s"""SELECT l_returnflag, count(*)::BIGINT AS cnt,
        |round((${sqlDsum("l_quantity * l_extendedprice", 4)} -
        |  ${sqlDsum("l_quantity", 2)} * ${sqlDsum("l_extendedprice", 2)}
        |  / count(*)) / (count(*) - 1), 8) AS cov_qty_price,
        |round((count(*) * ${sqlDsum("l_quantity * l_extendedprice", 4)} -
        |  ${sqlDsum("l_quantity", 2)} * ${sqlDsum("l_extendedprice", 2)})
        | / sqrt((count(*) * ${sqlDsum("l_quantity * l_quantity", 4)} -
        |    ${sqlDsum("l_quantity", 2)} * ${sqlDsum("l_quantity", 2)}) *
        |   (count(*) * ${sqlDsum("l_extendedprice * l_extendedprice", 4)} -
        |    ${sqlDsum("l_extendedprice", 2)} * ${sqlDsum("l_extendedprice", 2)})), 8)
        |  AS corr_qty_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))),

    // Pivot (explicit value list so the output schema is static — the
    // only shape that scales: no second pass to discover columns).
    Q("agg_pivot",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("O"), lit(0L)).as("cnt_o"),
          coalesce(col("F"), lit(0L)).as("cnt_f"),
          coalesce(col("P"), lit(0L)).as("cnt_p"))
        .orderBy(col("o_orderpriority")),
      Some(sql("""SELECT o_orderpriority,
        |count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT AS cnt_o,
        |count(*) FILTER (WHERE o_orderstatus = 'F')::BIGINT AS cnt_f,
        |count(*) FILTER (WHERE o_orderstatus = 'P')::BIGINT AS cnt_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))),

    // Unpivot/melt (wide→long) — the inverse reshaping of agg_pivot.
    // Spark compiles `unpivot` to an Expand node: every input row is
    // replayed once per value column in the SAME task (no shuffle, no
    // data blow-up beyond the deliberate 3×), so the only exchange is the
    // 3-group final aggregate. The count pins the exact row
    // multiplication; the decimal-accumulated sum (dsum — double
    // emission per rule D9) pins content.
    Q("agg_unpivot",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount")),
          "metric", "val")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("cnt"), dsum(col("val"), 2).as("sum_val"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
        .transform(df => orderedDomain(df, col("metric"))),
      Some(sql(s"""WITH long AS (
        |  SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount FROM lineitem)
        |SELECT metric, count(*)::BIGINT AS cnt,
        |${sqlDsum("val", 2)} AS sum_val,
        |min(val) AS min_val, max(val) AS max_val
        |FROM long GROUP BY metric ORDER BY metric"""))),

    // Shannon entropy of the per-language source mix — the corpus-
    // diversity diagnostic a training-data pipeline tracks per ingest
    // (a lang whose source entropy collapses is being fed by one crawl).
    // H = ln N − (Σ c·ln c)/N over the domain-sized (lang, source)
    // count table, so every input is an exact integer count and the only
    // float work is ln on integers (bit-identical cross-engine) and one
    // decimal-snapped sum. The per-row snap of c·ln c at scale 6 is NOT
    // exact once c·ln c carries more than ~15 significant digits
    // (c ≳ 1e7): the two engines can round the same double to adjacent
    // 1e-6 cells (shortest-repr vs exact-binary rounding). What holds at
    // EVERY scale is the error bound: a straddle changes the sum by 1e-6
    // per affected row, and H divides by n_docs, so the cross-engine
    // divergence of H is ≤ n_sources·1e-6/n_docs — shrinking with corpus
    // size and many orders below the round-6 boundary distance the
    // preflight audit enforces (code-review r10 corrected the earlier
    // "exact up to 1e9 docs" overclaim). The final division/round is the
    // same IEEE op on both engines. Two cascaded domain-sized aggregates;
    // the only fact-proportional cost is the first map-side count.
    Q("agg_entropy",
      (s, dir) => Tables.table(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sources"),
          sum(col("c")).as("n_docs"),
          // c·ln c is transcendental — NOT exact at 6dp, so the snap-sum
          // (BigDecimal HALF_UP) stays; the fast dsum is for exact inputs.
          round(log(sum(col("c"))) -
            dsumSnap(col("c") * log(col("c")), 6) / sum(col("c")), 6)
            .as("entropy_r6"))
        .orderBy(col("lang")),
      Some(sql(s"""WITH cs AS (
        |  SELECT lang, source, count(*)::BIGINT AS c
        |  FROM documents GROUP BY lang, source)
        |SELECT lang, count(*)::BIGINT AS n_sources,
        |sum(c)::BIGINT AS n_docs,
        |round(ln(sum(c)::BIGINT) -
        |  ${sqlDsum("c * ln(c)", 6)} / sum(c)::BIGINT, 6) AS entropy_r6
        |FROM cs GROUP BY lang ORDER BY lang"""))),

    // D4: collections only ever emitted sorted; joined to a string so the
    // driver's column hash sees a scalar (list physical-type friction).
    Q("agg_collect_sorted",
      (s, dir) => Tables.table(s, dir, "supplier")
        .join(broadcast(Tables.table(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(concat_ws(",", sort_array(collect_list(col("s_name"))))
          .as("supplier_names"),
          count(lit(1)).as("supplier_cnt"))
        .orderBy(col("n_name")),
      Some(sql("""SELECT n_name,
        |string_agg(s_name, ',' ORDER BY s_name) AS supplier_names,
        |count(*)::BIGINT AS supplier_cnt
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name"""))),

    // Deterministic mode: most frequent o_orderpriority per order status,
    // ties to the SMALLEST value. Spark's built-in `mode` aggregate is
    // documented non-deterministic on ties — unusable under hash-check —
    // so mode composes as two-phase count + per-group top-1 window (the
    // topk_per_group k=1 shape, also served by the native TopK plan).
    Q("agg_mode",
      (s, dir) => {
        val c = Tables.table(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("cnt").desc, col("o_orderpriority").asc)
        c.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderstatus"),
            col("o_orderpriority").as("mode_priority"),
            col("cnt").as("mode_cnt"))
          .orderBy(col("o_orderstatus"))
      },
      Some(sql("""WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS cnt
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
        |        ORDER BY cnt DESC, o_orderpriority ASC) AS rn FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  cnt AS mode_cnt
        |FROM r WHERE rn = 1 ORDER BY o_orderstatus"""))),

    // Bitwise aggregates (bitmask accumulation — feature flags, bloom-ish
    // membership unions): AND/OR/XOR are associative+commutative, so the
    // two-phase partial/final split is exact at any partition count.
    Q("agg_bitwise",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("bit_and(l_orderkey)").as("band"),
          expr("bit_or(l_orderkey)").as("bor"),
          expr("bit_xor(l_orderkey)").as("bxor"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag")),
      Some(sql("""SELECT l_returnflag,
        |bit_and(l_orderkey)::BIGINT AS band,
        |bit_or(l_orderkey)::BIGINT AS bor,
        |bit_xor(l_orderkey)::BIGINT AS bxor,
        |count(*)::BIGINT AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))),

    // Argmax/argmin surface (max_by/min_by ↔ DuckDB arg_max/arg_min): the
    // ordering column is the UNIQUE event_id, so ties are impossible and
    // the result is deterministic cross-engine (a value-ordered max_by
    // would be tie-nondeterministic — same reason agg_mode breaks ties by
    // priority). Same two-phase hash-agg shape as every groupBy here: the
    // shuffle carries one (group × partition) pair, scale-safe.
    Q("agg_argmax",
      (s, dir) => Tables.table(s, dir, "events")
        .groupBy(col("event_type"))
        .agg(max_by(col("user_id"), col("event_id")).as("last_user"),
          min_by(col("user_id"), col("event_id")).as("first_user"),
          max(col("event_id")).as("last_event"),
          min(col("event_id")).as("first_event"))
        .orderBy(col("event_type")),
      Some(sql("""SELECT event_type,
        |arg_max(user_id, event_id) AS last_user,
        |arg_min(user_id, event_id) AS first_user,
        |max(event_id) AS last_event,
        |min(event_id) AS first_event
        |FROM events GROUP BY event_type ORDER BY event_type"""))),

    // D9 probe history (r14, VERDICT r13 task 4 — the registry's first
    // deliberate shrink, 189→187): `diag_decimal_repr` (the three-
    // representation hasher-localization probe, r10) and
    // `canary_string_sum` (the fixed-scale-STRING emission canary, r12)
    // are RETIRED. The canary came back driver-hash-green in
    // CORRECTNESS_r12 AND r13 — two consecutive driver proofs — and the
    // adopted STRING emission itself (flagship sum_charge + typed twin)
    // was driver-green in r13. The rule they established lives in D9
    // (SURVEY §2.0) and Det.dsumx's scaladoc: accumulate in DECIMAL,
    // emit double/BIGINT/fixed-scale STRING, never a raw decimal column
    // at the graded interface. Restore from git history if a future
    // hasher change needs re-localization.
  )
}
