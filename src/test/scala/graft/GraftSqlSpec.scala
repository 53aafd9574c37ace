package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL facade exposes the same engine: Spark SQL text over the
  * registered views matches the DataFrame-built operators. */
class GraftSqlSpec extends AnyFunSuite {
  import TestSpark._

  test("SQL Q1 over views matches the DataFrame flagship") {
    // sum_qty accumulates as exact DECIMAL(38,2) and emits as double
    // (Det.dsum — D9, round 11)
    val viaSql = GraftSql.sql(spark, sf,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSeq
    val viaDf = Registry.queries("agg_hash_groupby")(spark, sf)
      .selectExpr("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getLong(3))).toSeq
    assert(viaSql === viaDf)
  }

  test("native graft_dot is callable from SQL text") {
    GraftSql.register(spark, sf)
    val n = spark.sql(
      "SELECT graft_dot(embedding, embedding) AS d FROM embeddings")
      .filter("d <= 0").count()
    assert(n === 0)
  }

  test("events view exposes the ns-safe derived time columns") {
    GraftSql.register(spark, sf)
    val bad = spark.sql(
      "SELECT count(*) AS c FROM events WHERE ts_t IS NULL OR ts_us <= 0")
      .head.getLong(0)
    assert(bad === 0)
  }

  // ---------------------------------------------------------------------
  // SQL-twin sweep (r15, VERDICT r14 task 7): a representative key per
  // operator family, re-expressed as Spark SQL TEXT over the registered
  // views, must return the same rows as the DataFrame-built operator.
  // This is the migration contract for SQL-first users: the view layer
  // (plain projections over the parquet reads) adds nothing and loses
  // nothing — same semantics, same pushdown (explain-checked below).
  // The texts mirror each key's DuckDB oracle with dialect translation
  // only (strftime→date_format, ::BIGINT→CAST, string_split→split,
  // unnest→explode, epoch_us(ts)→the view's ts_us, dow_sun0 = Spark's
  // dayofweek-1); column names and ORDER BY match the oracle, so rows
  // compare positionally.
  // ---------------------------------------------------------------------
  private val sqlTwins: Map[String, String] = Map(
    "scan_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber,
        |  date_format(l_shipdate, 'yyyy-MM-dd') AS ship_day
        |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber, ship_day""".stripMargin,
    "project_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    AS DECIMAL(18,6)) AS DOUBLE) AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin,
    "filter_conjunction" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 30 AND l_discount > 0.02
        |  AND NOT (l_returnflag = 'A')) OR l_extendedprice > 90000
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag""".stripMargin,
    "filter_in_like" ->
      """SELECT p_partkey, p_name, p_type, p_brand FROM part
        |WHERE p_type IN ('PROMO','ECONOMY','STANDARD')
        |  AND p_name LIKE '%widget%'
        |ORDER BY p_partkey""".stripMargin,
    "project_case_when" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice < 50000 THEN 'low'
        |       WHEN o_totalprice < 150000 THEN 'mid'
        |       WHEN o_totalprice < 300000 THEN 'high'
        |       ELSE 'premium' END AS price_band
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "join_broadcast_hash" ->
      """SELECT l_orderkey, l_linenumber, p_partkey, p_name, p_brand
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY l_orderkey, l_linenumber, p_partkey, p_name, p_brand""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, c_name,
        |  CAST(count(o_orderkey) AS BIGINT) AS urgent_cnt
        |FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,
    "join_left_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "join_left_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "agg_count_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS distinct_customers,
        |  CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS distinct_statuses
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "agg_filtered" ->
      """SELECT s_nationkey,
        |  CAST(count(*) FILTER (WHERE s_acctbal > 0) AS BIGINT) AS cnt_pos,
        |  CAST(count(*) FILTER (WHERE s_acctbal <= 0) AS BIGINT) AS cnt_nonpos,
        |  CAST(count(*) AS BIGINT) AS cnt_total
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "agg_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
        |  coalesce(n_name, 'ALL') AS nation_name,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name, nation_name""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority""".stripMargin,
    "window_ranking" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
        |  rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS drnk,
        |  ntile(4) OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile
        |FROM orders ORDER BY o_custkey, rn""".stripMargin,
    "window_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(event_id, 1) OVER w AS prev_event_id,
        |  lead(event_id, 1) OVER w AS next_event_id,
        |  ts_us - lag(ts_us, 1) OVER w AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)
        |ORDER BY event_id""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  date_format(o_orderdate, 'yyyy-MM-dd') AS order_day,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "topk_per_group" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "global_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""".stripMargin,
    "set_union_distinct" ->
      """SELECT o_custkey FROM (
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  UNION
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000))
        |ORDER BY o_custkey""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM (
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  INTERSECT
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000))
        |ORDER BY o_custkey""".stripMargin,
    "set_except" ->
      """SELECT o_custkey FROM (
        |  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |  EXCEPT
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000))
        |ORDER BY o_custkey""".stripMargin,
    "scalar_string" ->
      """SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS low_brand,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_name, 1, 5) AS name_pre,
        |  concat_ws('-', p_brand, p_type) AS brand_type,
        |  lpad(p_brand, 10, '*') AS brand_pad,
        |  trim(concat(' ', p_name, ' ')) AS trimmed,
        |  replace(p_name, ' ', '_') AS name_und,
        |  CAST(size(split(p_name, ' ')) AS BIGINT) AS word_cnt
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_date" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        |  CAST(dayofweek(o_orderdate) - 1 AS BIGINT) AS dow_sun0,
        |  date_format(date_trunc('month', o_orderdate), 'yyyy-MM-dd')
        |    AS month_start,
        |  CAST(datediff(DATE '2002-01-01', o_orderdate) AS BIGINT)
        |    AS days_to_2002,
        |  date_format(add_months(o_orderdate, 3), 'yyyy-MM-dd') AS plus_3m,
        |  date_format(last_day(o_orderdate), 'yyyy-MM-dd') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "scalar_math" ->
      """SELECT o_orderkey, o_totalprice, abs(o_totalprice - 250000) AS abs_dev,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil,
        |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
        |  sqrt(o_totalprice) AS price_sqrt,
        |  round(ln(o_totalprice), 6) AS price_ln_r6,
        |  round(exp(o_totalprice / 500000.0), 6) AS price_exp_r6,
        |  pow(2.0, o_orderkey % 10) AS pow2_mod,
        |  greatest(o_totalprice, 100000.0) AS hi,
        |  least(o_totalprice, 100000.0) AS lo,
        |  o_orderkey % 7 AS key_mod7
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "text_wordcount" ->
      """SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
        |  SELECT explode(split(text, ' ')) AS word FROM documents)
        |GROUP BY word ORDER BY cnt DESC, word ASC LIMIT 50""".stripMargin,
    "text_length_stats" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
        |  CAST(max(size(split(text, ' '))) AS BIGINT) AS max_tokens,
        |  CAST(count(*) FILTER (WHERE n_chars = length(text)) AS BIGINT)
        |    AS n_valid
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "events_tumbling_window" ->
      """SELECT date_format(date_trunc('hour', ts_t), 'yyyy-MM-dd HH:mm:ss')
        |    AS hour_start, event_type,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY date_trunc('hour', ts_t), event_type
        |ORDER BY hour_start, event_type""".stripMargin,
  )

  // Numeric-width-insensitive cell compare: integral widths normalize to
  // Long; doubles must be bit-equal OR within 1e-12 relative (both sides
  // are Spark-computed, but window/agg plan shapes may legally reassociate
  // a non-decimal-anchored double sum).
  private def isIntegral(n: Number): Boolean = n match {
    case _: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer |
        _: java.lang.Long => true
    case _ => false
  }
  private def cellEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Number, y: Number) if isIntegral(x) && isIntegral(y) =>
      x.longValue == y.longValue
    case (x: Number, y: Number)
        if !x.isInstanceOf[java.lang.Double] && !x.isInstanceOf[java.lang.Float]
          && !y.isInstanceOf[java.lang.Double] && !y.isInstanceOf[java.lang.Float] =>
      // DECIMAL cells (or mixed decimal/integral): exact value compare —
      // the old longValue branch truncated the fraction and would have
      // called 10.4 == 10.5 on a future DecimalType twin (ADVICE r15).
      new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)) == 0
    case (x: Number, y: Number) =>
      val (dx, dy) = (x.doubleValue, y.doubleValue)
      dx == dy || math.abs(dx - dy) <= 1e-12 * math.max(math.abs(dx), math.abs(dy))
    case _ => a == b
  }

  sqlTwins.foreach { case (key, text) =>
    test(s"SQL twin matches the DataFrame operator: $key") {
      val viaSql = GraftSql.sql(spark, sf, text)
      val viaDf = Registry.queries(key)(spark, sf)
      assert(viaSql.columns.toSeq === viaDf.columns.toSeq,
        s"$key: column names diverge")
      val (rs, rd) = (viaSql.collect(), viaDf.collect())
      assert(rs.length === rd.length, s"$key: row counts diverge")
      rs.zip(rd).zipWithIndex.foreach { case ((s, d), i) =>
        assert(s.length == d.length &&
          (0 until s.length).forall(j => cellEq(s.get(j), d.get(j))),
          s"$key row $i: sql=$s df=$d")
      }
    }
  }

  test("view layer preserves parquet pushdown (filter + projection + " +
      "partial agg)") {
    GraftSql.register(spark, sf)
    // filter pushdown: the shipdate predicate must reach the parquet scan
    // THROUGH the temp view, exactly as the DataFrame path plans it
    val p1 = spark.sql(
      """SELECT l_orderkey, l_quantity FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'""".stripMargin)
      .queryExecution.executedPlan.toString
    assert(p1.contains("PushedFilters:") &&
      p1.contains("GreaterThanOrEqual(l_shipdate"), p1.take(2000))
    // projection pruning: a 2-column query over the view reads 3 columns
    // (2 projected + the filter column), never the 16-column row
    assert(p1.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double,l_shipdate:timestamp"), p1.take(2000))
    // aggregate pushdown shape: GROUP BY through the view still plans the
    // two-phase hash aggregate with map-side partials
    val p2 = spark.sql(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1")
      .queryExecution.executedPlan.toString
    assert(p2.contains("HashAggregate") && p2.contains("partial_sum"),
      p2.take(2000))
  }
}
