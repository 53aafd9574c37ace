package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** §2.1-B — projections / filters / predicates (SURVEY.md:176-182).
  *
  * All pure narrow transformations: no shuffle except the final total-order
  * sort the determinism contract (D1) requires. At 100 TB each of these is
  * a single codegen'd scan stage; filters land in `PushedFilters` of the
  * parquet scan.
  */
object RowOps {
  import Det._

  val qs: Seq[Q] = Seq(
    // net price = extprice(2dp) * (1-disc)(2dp) * (1+tax)(2dp): intrinsic
    // scale 6 → snap there (see Det scaladoc), never `round`.
    Q("project_arithmetic",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          // exact at 6dp → fast units snap (r17, guide §4): same double,
          // ~10× less per-row work than the BigDecimal-routed cast
          dexactf(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")), 6).as("net_price"))
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures — D1
        // total order spans all emitted columns (see Scans scaladoc).
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price")),
      Some(sql(s"""SELECT l_orderkey, l_linenumber,
        |${sqlDexact("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)}
        |  AS net_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price"""))),

    Q("filter_conjunction",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .filter((col("l_quantity").between(10, 30)
            && col("l_discount") > 0.02
            && !(col("l_returnflag") === "A"))
          || col("l_extendedprice") > 90000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"), col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_discount"), col("l_returnflag")),
      Some(sql("""SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
        |l_returnflag FROM lineitem
        |WHERE (l_quantity BETWEEN 10 AND 30 AND l_discount > 0.02
        |       AND NOT (l_returnflag = 'A'))
        |   OR l_extendedprice > 90000
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount,
        |  l_returnflag"""))),

    Q("filter_in_like",
      (s, dir) => Tables.table(s, dir, "part")
        .filter(col("p_type").isin("PROMO", "ECONOMY", "STANDARD")
          && col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_name"), col("p_type"),
          col("p_brand"))
        .orderBy(col("p_partkey")),
      Some(sql("""SELECT p_partkey, p_name, p_type, p_brand FROM part
        |WHERE p_type IN ('PROMO','ECONOMY','STANDARD')
        |  AND p_name LIKE '%widget%'
        |ORDER BY p_partkey"""))),

    // Three-valued logic: nullif / isNull / coalesce over l_discount = 0.
    Q("filter_null_semantics",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          nullif(col("l_discount"), lit(0.0)).as("disc_nn"),
          nullif(col("l_discount"), lit(0.0)).isNull.cast("long")
            .as("is_free"),
          coalesce(nullif(col("l_discount"), lit(0.0)), lit(-1.0))
            .as("disc_or_neg1"))
        // disc_or_neg1 is never null and determines disc_nn/is_free, so it
        // completes the total order over non-unique (orderkey, linenumber).
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("disc_or_neg1")),
      Some(sql("""SELECT l_orderkey, l_linenumber,
        |nullif(l_discount, 0.0) AS disc_nn,
        |CAST(nullif(l_discount, 0.0) IS NULL AS BIGINT) AS is_free,
        |coalesce(nullif(l_discount, 0.0), -1.0) AS disc_or_neg1
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, disc_or_neg1"""))),

    Q("project_case_when",
      (s, dir) => Tables.table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .when(col("o_totalprice") < 300000, "high")
            .otherwise("premium").as("price_band"))
        .orderBy(col("o_orderkey")),
      Some(sql("""SELECT o_orderkey, o_totalprice,
        |CASE WHEN o_totalprice < 50000 THEN 'low'
        |     WHEN o_totalprice < 150000 THEN 'mid'
        |     WHEN o_totalprice < 300000 THEN 'high'
        |     ELSE 'premium' END AS price_band
        |FROM orders ORDER BY o_orderkey"""))),
  )
}
