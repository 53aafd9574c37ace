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
}
