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
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

/** Determinism helpers (SURVEY.md §2.0 rules D1–D8).
  *
  * Cross-engine hash-matching of double aggregates cannot rely on rounding
  * alone: a 60k-row double sum differs between engines in the last ulps and
  * occasionally flips a round(x, 2) boundary. Instead, decimal-like inputs
  * (prices, quantities, discounts — all fixed-scale decimals stored as
  * doubles) are cast per-row to DECIMAL(18, s) — an EXACT recovery of the
  * intended value, since the double's error (~1e-11 relative) is far below
  * the cast's rounding threshold — then summed exactly (decimal addition is
  * associative), then cast back to double (sums stay within double's 15
  * exact digits). The result is bit-identical in Spark and DuckDB regardless
  * of partial-aggregation order.
  */
object Det {
  /** Exact, order-independent sum of a fixed-scale-decimal double column. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Exact mean derived from the exact sum (identical division on identical
    * doubles in both engines). */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** SQL twin of [[dsum]] for oracle queries. */
  def sqlDsum(e: String, scale: Int = 2): String =
    s"CAST(sum(CAST(($e) AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** SQL twin of [[davg]]. */
  def sqlDavg(e: String, scale: Int = 2): String =
    s"(${sqlDsum(e, scale)} / count(*))"

  /** Timestamps are never emitted raw (events.ts is ns in parquet, µs in
    * Spark — SURVEY §7.4 R1); format to string on both sides. */
  def day(c: Column): Column = date_format(c, "yyyy-MM-dd")
  def second(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
}
