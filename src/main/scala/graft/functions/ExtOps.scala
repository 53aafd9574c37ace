package graft.functions

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.1-K — UDF / UDAF extension surface (SURVEY.md:286-289).
  *
  * Kept deliberately minimal: built-ins beat UDFs at scale (codegen +
  * pushdown), so the engine's extension points are demonstrated once each.
  * The UDF is deterministic (never `.asNondeterministic`) so Catalyst may
  * still reorder/push surrounding predicates.
  */
object ExtOps {
  import Det._

  /** Geometric mean of a positive double column.
    *
    * Accumulates `round(ln(x) * 1e12)` as an exact integer sum — double
    * summation order would make the result partition-dependent; the
    * integer-micro-ln sum is order-independent and matches the SQL twin's
    * `sum(CAST(round(ln(x) * 1e12) AS BIGINT))` on any engine. Headroom:
    * |ln(x)|·1e12 ≤ ~3e13 per row → 3e5 rows per 1e18 of Long range at
    * this magnitude; at true 100 TB row counts widen to DECIMAL(38,0).
    * The final `exp` differs from C libm by ≤1 ulp → emitted rounded to 4dp.
    */
  object GeoMean extends Aggregator[Double, (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), x: Double): (Long, Long) =
      (b._1 + math.round(math.log(x) * 1e12), b._2 + 1)
    def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1.toDouble / 1e12 / b._2)
    def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val qs: Seq[Q] = Seq(
    Q("udf_scalar_demo",
      (s, dir) => {
        val priceBand = udf((p: Double) =>
          if (p < 50000) "low"
          else if (p < 150000) "mid"
          else if (p < 300000) "high"
          else "premium")
        Tables.table(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"),
            priceBand(col("o_totalprice")).as("price_band"))
          .orderBy(col("o_orderkey"))
      },
      Some(sql("""SELECT o_orderkey, o_totalprice,
        |CASE WHEN o_totalprice < 50000 THEN 'low'
        |     WHEN o_totalprice < 150000 THEN 'mid'
        |     WHEN o_totalprice < 300000 THEN 'high'
        |     ELSE 'premium' END AS price_band
        |FROM orders ORDER BY o_orderkey"""))),

    Q("udaf_geomean",
      (s, dir) => {
        val geo = udaf(GeoMean)
        Tables.table(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(round(geo(col("l_extendedprice")), 4).as("geomean_price"),
            count(lit(1)).as("cnt"))
          .orderBy(col("l_returnflag"))
      },
      Some(sql("""SELECT l_returnflag,
        |round(exp(CAST(sum(CAST(round(ln(l_extendedprice) * 1e12)
        |  AS BIGINT)) AS DOUBLE) / 1e12 / count(*)), 4) AS geomean_price,
        |count(*)::BIGINT AS cnt
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))),
  )
}
