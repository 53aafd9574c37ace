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
    * integer-pico-ln sum is order-independent and exact. The sum is kept
    * in two base-1e18 limbs (hi, lo with |lo| < 1e18) so it stays exact to
    * ~9e36 — matching the SQL twin's `sum(BIGINT)` which DuckDB widens to
    * HUGEINT — instead of silently wrapping a single Long at ~7e5
    * rows/group (ADVICE r2). Per-row values are |ln(x)|·1e12 ≤ ~3.5e13, so
    * the 100-TB ceiling is now ~2.6e23 rows/group.
    *
    * Cross-engine caveats (empirical, not guaranteed): JVM `Math.log` is
    * observed to agree with the oracle's libm `ln` at these inputs (a
    * 1-ulp divergence exactly at a *.5 pico-boundary would flip one row's
    * integer), and the final limb-sum→double conversion plus `exp` differ
    * by ≤1 ulp across builds — absorbed by the emitted round(·, 4).
    */
  object GeoMean extends Aggregator[Double, (Long, Long, Long), Double] {
    private val Radix = 1000000000000000000L // 1e18, limb base

    def zero: (Long, Long, Long) = (0L, 0L, 0L) // (hi, lo, count)

    private def carry(hi: Long, lo: Long): (Long, Long) =
      if (lo >= Radix) (hi + 1, lo - Radix)
      else if (lo <= -Radix) (hi - 1, lo + Radix)
      else (hi, lo)

    def reduce(b: (Long, Long, Long), x: Double): (Long, Long, Long) = {
      val pico = math.log(x) * 1e12
      // ln(x ≤ 0) = -Inf/NaN would round to Long.MinValue and silently
      // destroy the limb invariant — fail loudly instead, matching the
      // oracle twin where CAST(-Inf AS BIGINT) errors.
      require(java.lang.Double.isFinite(pico),
        s"GeoMean requires positive finite input, got $x")
      // |lo| < 1e18 and |row| ≤ ~3.5e13 — the Long add cannot overflow
      val (h, l) = carry(b._1, b._2 + math.round(pico))
      (h, l, b._3 + 1)
    }
    def merge(a: (Long, Long, Long), b: (Long, Long, Long)):
        (Long, Long, Long) = {
      val (h, l) = carry(a._1 + b._1, a._2 + b._2) // |lo+lo| < 2e18 < 2^63
      (h, l, a._3 + b._3)
    }
    def finish(b: (Long, Long, Long)): Double =
      if (b._3 == 0) 0.0
      else {
        val total = (BigDecimal(b._1) * BigDecimal(Radix) + BigDecimal(b._2))
          .toDouble // correctly-rounded int→double, like CAST(HUGEINT AS DOUBLE)
        math.exp(total / 1e12 / b._3)
      }
    def bufferEncoder: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong)
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
