package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * All real definitions live in [[Registry]] (one `Q` per operator). */
object SparkEntry {
  /** Flagship: TPC-H Q1 pricing summary on sf0.001 (SURVEY §2.1-D
    * `agg_hash_groupby`); driver smoke-checks rows>0 (always 6 groups). */
  def entry(spark: SparkSession): DataFrame =
    operators.Aggs.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (sketches, side-effecting
    * round-trips, map types) get the driver's rows-only check. */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
