package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** §2.1-F — sorts / limits / top-k / set operations (SURVEY.md:227-234).
  *
  * `orderBy(...).limit(k)` compiles to `TakeOrderedAndProject` — each task
  * keeps a k-row heap and the driver merges per-partition heaps, so global
  * top-k never materializes a full sort at any scale. The set ops shuffle
  * on the full row (distinct) — at 100 TB pre-aggregate or bucket first;
  * here inputs are key-projected before the set op for exactly that reason.
  */
object SetOps {
  import Det._

  private def urgent(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")

  private def highValue(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders").filter(col("o_totalprice") > 300000)

  private val urgentSql = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
  private val highSql = "SELECT o_custkey FROM orders WHERE o_totalprice > 300000"

  val qs: Seq[Q] = Seq(
    Q("sort_multikey",
      (s, dir) => Tables.table(s, dir, "lineitem")
        .orderBy(col("l_returnflag").asc, col("l_extendedprice").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .select(col("l_returnflag"), col("l_extendedprice"),
          col("l_orderkey"), col("l_linenumber"))
        .limit(100),
      Some(sql("""SELECT l_returnflag, l_extendedprice, l_orderkey,
        |l_linenumber FROM lineitem
        |ORDER BY l_returnflag ASC, l_extendedprice DESC,
        |  l_orderkey ASC, l_linenumber ASC
        |LIMIT 100"""))),

    Q("global_topk",
      (s, dir) => Tables.table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(20),
      Some(sql("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20"""))),

    Q("set_union_all",
      (s, dir) => urgent(s, dir)
        .select(lit("urgent").as("src"), col("o_orderkey"), col("o_custkey"))
        .unionByName(highValue(s, dir)
          .select(lit("high_value").as("src"), col("o_orderkey"),
            col("o_custkey")))
        .orderBy(col("src"), col("o_orderkey")),
      Some(sql("""SELECT * FROM (
        |  SELECT 'urgent' AS src, o_orderkey, o_custkey FROM orders
        |    WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'high_value' AS src, o_orderkey, o_custkey FROM orders
        |    WHERE o_totalprice > 300000)
        |ORDER BY src, o_orderkey"""))),

    Q("set_union_distinct",
      (s, dir) => urgent(s, dir).select(col("o_custkey"))
        .union(highValue(s, dir).select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey")),
      Some(sql(s"""SELECT o_custkey FROM
        |(($urgentSql) UNION ($highSql)) ORDER BY o_custkey"""))),

    // Multiset semantics: duplicates preserved per-occurrence (a customer
    // with 3 urgent and 1 high-value order keeps 2 copies in EXCEPT ALL).
    Q("set_except_all",
      (s, dir) => urgent(s, dir).select(col("o_custkey"))
        .exceptAll(highValue(s, dir).select(col("o_custkey")))
        .orderBy(col("o_custkey")),
      Some(sql(s"""SELECT o_custkey FROM
        |(($urgentSql) EXCEPT ALL ($highSql)) ORDER BY o_custkey"""))),

    Q("set_intersect_all",
      (s, dir) => urgent(s, dir).select(col("o_custkey"))
        .intersectAll(highValue(s, dir).select(col("o_custkey")))
        .orderBy(col("o_custkey")),
      Some(sql(s"""SELECT o_custkey FROM
        |(($urgentSql) INTERSECT ALL ($highSql)) ORDER BY o_custkey"""))),

    Q("set_intersect",
      (s, dir) => urgent(s, dir).select(col("o_custkey"))
        .intersect(highValue(s, dir).select(col("o_custkey")))
        .orderBy(col("o_custkey")),
      Some(sql(s"""SELECT o_custkey FROM
        |(($urgentSql) INTERSECT ($highSql)) ORDER BY o_custkey"""))),

    Q("set_except",
      (s, dir) => urgent(s, dir).select(col("o_custkey"))
        .except(highValue(s, dir).select(col("o_custkey")))
        .orderBy(col("o_custkey")),
      Some(sql(s"""SELECT o_custkey FROM
        |(($urgentSql) EXCEPT ($highSql)) ORDER BY o_custkey"""))),
  )
}
