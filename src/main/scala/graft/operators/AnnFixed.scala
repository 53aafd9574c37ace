package graft.operators

import graft.{Det, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-codebook ANN twins (VERDICT r6 task 1): the IVF / IVF-PQ *search
  * algebra* — probe join, flat-LUT ADC scoring, shortlist, exact rerank —
  * hash-checked against DuckDB.
  *
  * The production keys (`vec_ann_ivf`, `vec_ann_ivfpq` in
  * [[PipelineOps]]) train their codebooks with k-means, whose centroids
  * are engine-derived doubles → rows-only by design (D3). But given a
  * FIXED codebook the entire search pipeline is deterministic: every
  * score is a sequential fold over identical doubles (floats widen
  * exactly; Spark's `aggregate`/`graft_dot` and DuckDB's `list_reduce`
  * fold left-to-right; sqrt and division are IEEE-correctly-rounded), and
  * every ranking tie-breaks on an integer id. So these keys embed the
  * codebook as a shared integer FORMULA — the `scalar_trig` literal-table
  * precedent (SURVEY §9), generated rather than spelled out because
  * 4×64 + 16×16 literal doubles would be noise:
  *
  *   coarse centroid l, component j (1-based):  (l·31 + j·17) mod 7 − 3
  *   PQ cell (sub s, code c), component j:   ((s·5 + c·3 + j·11) mod 7 − 3)/8
  *
  * Small exact integers (and exact eighths — divisor is a power of two),
  * identical in both formulations; coarse centroids are unit-normalized
  * on both sides before use. The search runs over unit-normalized corpus
  * vectors exactly like the trained keys, so a regression in the probe
  * join, the LUT lookup arithmetic, the shortlist window, or the rerank
  * join now fails the driver's hash gate instead of only AnnRecallSpec.
  *
  * Scale shape is the trained keys': codebooks broadcast (they are KB),
  * probe rows carry only (q_id, list_id), candidates are scored from m
  * `element_at` lookups into one flat LUT array, and raw vectors are
  * touched only for the ≤20 reranked rows per query.
  */
object AnnFixed {
  import Det._

  private def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  private val sqlDot =
    (a: String, b: String) =>
      s"list_reduce(list_transform(list_zip($a, $b), p -> p[1] * p[2]), (x, y) -> x + y)"

  /** (vec_id, u): unit-normalized double vectors. */
  private def normed(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftFunctions.register(s)
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("u", transform(col("v"),
        x => x / sqrt(dot(col("v"), col("v")))))
      .select(col("vec_id"), col("u"))
  }

  private val sqlNormed =
    s"""e AS (SELECT vec_id,
       |  list_transform(embedding::DOUBLE[],
       |    x -> x / sqrt(${sqlDot("embedding::DOUBLE[]",
                 "embedding::DOUBLE[]")})) AS u
       |  FROM embeddings)"""

  /** 4 unit-normalized coarse centroids from the integer formula. */
  private def coarseCb(s: SparkSession): DataFrame =
    s.range(0, 4).select(col("id").as("list_id"),
        expr("transform(sequence(1, 64), " +
          "j -> CAST((id * 31 + j * 17) % 7 - 3 AS DOUBLE))").as("cv"))
      .withColumn("cu", transform(col("cv"),
        x => x / sqrt(dot(col("cv"), col("cv")))))
      .select(col("list_id"), col("cu"))

  private val sqlCoarseCb =
    s"""cb AS (SELECT l AS list_id,
       |  list_transform(generate_series(1, 64),
       |    j -> ((l * 31 + j * 17) % 7 - 3)::DOUBLE) AS cv
       |  FROM generate_series(0, 3) t(l)),
       |cbn AS (SELECT list_id,
       |  list_transform(cv, x -> x / sqrt(${sqlDot("cv", "cv")})) AS cu
       |  FROM cb)"""

  /** Nearest coarse list per vector (argmax cosine, ties to the smallest
    * list_id), u carried through for the scoring stage. */
  private def assign(e: DataFrame, cb: DataFrame): DataFrame =
    e.crossJoin(broadcast(cb))
      .withColumn("sim", dot(col("u"), col("cu")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("list_id")).as("negl"),
        col("list_id").as("list_id"), col("u").as("u"))).as("m"))
      .select(col("vec_id"), col("m.list_id").as("list_id"),
        col("m.u").as("u"))

  private val sqlAssign =
    s"""assign AS (SELECT vec_id, list_id, u FROM (
       |  SELECT e.vec_id, c.list_id, e.u,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY ${sqlDot("e.u", "c.cu")} DESC, c.list_id ASC) AS rn
       |  FROM e CROSS JOIN cbn c) WHERE rn = 1)"""

  /** Query set (first 8 by vec_id) and its nprobe=2 probed lists. */
  private def probeOf(e: DataFrame, cb: DataFrame): (DataFrame, DataFrame) = {
    val q = e.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("q_id"), col("u").as("qu"))
    val probe = q.crossJoin(broadcast(cb))
      .withColumn("sim", dot(col("qu"), col("cu")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("sim").desc, col("list_id").asc)))
      .filter(col("rn") <= 2)
      .select(col("q_id"), col("list_id"))
    (q, probe)
  }

  private val sqlProbe =
    s"""q AS (SELECT vec_id AS q_id, u AS qu FROM e
       |  ORDER BY vec_id LIMIT 8),
       |probe AS (SELECT q_id, list_id FROM (
       |  SELECT q.q_id, c.list_id,
       |    row_number() OVER (PARTITION BY q.q_id
       |      ORDER BY ${sqlDot("q.qu", "c.cu")} DESC, c.list_id ASC) AS rn
       |  FROM q CROSS JOIN cbn c) WHERE rn <= 2)"""

  val qs: Seq[Q] = Seq(
    // IVF-flat with the fixed codebook: probe 2 of 4 lists, exact cosine
    // over the probed lists' vectors, top-3 per query.
    Q("vec_ann_ivf_fixed",
      (s, dir) => {
        val e = normed(s, dir)
        val cb = coarseCb(s)
        val a = assign(e, cb)
        val (q, probe) = probeOf(e, cb)
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
        probe.join(a, "list_id")
          .filter(col("vec_id") =!= col("q_id"))
          .join(broadcast(q), "q_id")
          .withColumn("cos_sim", dot(col("qu"), col("u")))
          .withColumn("rn", row_number().over(wTop).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("rn"), col("vec_id").as("neighbor_id"),
            col("list_id").cast("long").as("list_id"), col("cos_sim"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(sql(s"""WITH $sqlNormed,
        |$sqlCoarseCb,
        |$sqlAssign,
        |$sqlProbe,
        |scored AS (
        |  SELECT p.q_id, a.vec_id, a.list_id,
        |    ${sqlDot("q.qu", "a.u")} AS cos_sim
        |  FROM probe p JOIN assign a USING (list_id)
        |  JOIN q ON q.q_id = p.q_id
        |  WHERE a.vec_id <> p.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, list_id, cos_sim,
        |    row_number() OVER (PARTITION BY q_id
        |      ORDER BY cos_sim DESC, vec_id ASC) AS rn
        |  FROM scored)
        |SELECT q_id, rn::BIGINT AS rn, vec_id AS neighbor_id,
        |  list_id::BIGINT AS list_id, cos_sim
        |FROM ranked WHERE rn <= 3 ORDER BY q_id, rn"""))),

    // IVF-PQ with both codebooks fixed: coarse probe bounds candidates,
    // 4×4 PQ codes + a per-query flat LUT (sorted by sub·k+code, summed
    // in fixed left-to-right order) build the ADC shortlist, top-20 per
    // query reranked by exact cosine, top-3 emitted.
    Q("vec_ann_ivfpq_fixed",
      (s, dir) => {
        val e = normed(s, dir)
        val cb = coarseCb(s)
        val a = assign(e, cb)
        val (q, probe) = probeOf(e, cb)
        // PQ codebook: m=4 subspaces × k=4 codes over 16-dim subvectors
        val pcb = s.range(0, 16).select(
          expr("CAST(id DIV 4 AS INT)").as("sub"),
          expr("CAST(id % 4 AS INT)").as("code"),
          expr("transform(sequence(1, 16), j -> CAST((" +
            "(id DIV 4) * 5 + (id % 4) * 3 + j * 11) % 7 - 3 AS DOUBLE)" +
            " / 8.0)").as("cv"))
          .withColumn("cnorm2", dot(col("cv"), col("cv")))
        // per-(vector, subspace) nearest code: argmin |c|² − 2x·c
        val codes = e
          .select(col("vec_id"), posexplode(expr(
            "transform(sequence(0, 3), j -> slice(u, j * 16 + 1, 16))"))
            .as(Seq("sub", "sv")))
          .join(broadcast(pcb), "sub")
          .withColumn("cost",
            col("cnorm2") - lit(2.0) * dot(col("sv"), col("cv")))
          .groupBy(col("vec_id"), col("sub"))
          .agg(min(struct(col("cost"), col("code"))).as("mc"))
          .groupBy(col("vec_id"))
          .agg(max(when(col("sub") === 0, col("mc.code"))).as("c0"),
            (1 until 4).map(j =>
              max(when(col("sub") === j, col("mc.code"))).as(s"c$j")): _*)
        // per-query flat LUT: entry sub·4+code = qu_sub · cv
        val lutArr = q.crossJoin(broadcast(pcb))
          .withColumn("idx", col("sub") * 4 + col("code"))
          .withColumn("lutval", dot(expr("slice(qu, sub * 16 + 1, 16)"),
            col("cv")))
          .groupBy(col("q_id"))
          .agg(expr("""transform(
            |  array_sort(collect_list(struct(idx, lutval))),
            |  x -> x.lutval)""".stripMargin).as("la"))
        val shortlist = probe.join(a.select(col("vec_id"), col("list_id")),
            "list_id")
          .filter(col("vec_id") =!= col("q_id"))
          .join(codes, "vec_id")
          .join(broadcast(lutArr), "q_id")
          .withColumn("approx_sim",
            (0 until 4).map(j =>
              expr(s"element_at(la, $j * 4 + c$j + 1)")).reduce(_ + _))
          .withColumn("arn", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("approx_sim").desc, col("vec_id").asc)))
          .filter(col("arn") <= 20)
          .select(col("q_id"), col("vec_id"), col("list_id"),
            col("approx_sim"))
        val wTop = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id").asc)
        shortlist
          .join(e, "vec_id")
          .join(broadcast(q), "q_id")
          .withColumn("cos_sim", dot(col("qu"), col("u")))
          .withColumn("rn", row_number().over(wTop).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("rn"), col("vec_id").as("neighbor_id"),
            col("list_id").cast("long").as("list_id"), col("approx_sim"),
            col("cos_sim"))
          .orderBy(col("q_id"), col("rn"))
      },
      Some(sql(s"""WITH $sqlNormed,
        |$sqlCoarseCb,
        |$sqlAssign,
        |$sqlProbe,
        |pcb AS (SELECT s AS sub, c AS code,
        |  list_transform(generate_series(1, 16),
        |    j -> ((s * 5 + c * 3 + j * 11) % 7 - 3) / 8.0) AS cv
        |  FROM generate_series(0, 3) ts(s)
        |  CROSS JOIN generate_series(0, 3) tc(c)),
        |sub AS (SELECT vec_id, s AS sub,
        |  list_slice(u, s * 16 + 1, s * 16 + 16) AS sv
        |  FROM e CROSS JOIN generate_series(0, 3) t(s)),
        |costs AS (SELECT v.vec_id, v.sub, p.code,
        |  ${sqlDot("p.cv", "p.cv")} - 2.0 * ${sqlDot("v.sv", "p.cv")}
        |    AS cost
        |  FROM sub v JOIN pcb p USING (sub)),
        |codesl AS (SELECT vec_id, sub, code FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id, sub
        |    ORDER BY cost ASC, code ASC) AS rn FROM costs) WHERE rn = 1),
        |codes AS (SELECT vec_id,
        |  max(CASE WHEN sub = 0 THEN code END) AS c0,
        |  max(CASE WHEN sub = 1 THEN code END) AS c1,
        |  max(CASE WHEN sub = 2 THEN code END) AS c2,
        |  max(CASE WHEN sub = 3 THEN code END) AS c3
        |  FROM codesl GROUP BY vec_id),
        |lut AS (SELECT q.q_id, p.sub * 4 + p.code AS idx,
        |  ${sqlDot(
             "list_slice(q.qu, p.sub * 16 + 1, p.sub * 16 + 16)", "p.cv")}
        |    AS lutval
        |  FROM q CROSS JOIN pcb p),
        |lutarr AS (SELECT q_id, list(lutval ORDER BY idx) AS la
        |  FROM lut GROUP BY q_id),
        |scored AS (SELECT p.q_id, a.vec_id, a.list_id,
        |  list_extract(la, 0 * 4 + c0 + 1) + list_extract(la, 1 * 4 + c1 + 1)
        |  + list_extract(la, 2 * 4 + c2 + 1)
        |  + list_extract(la, 3 * 4 + c3 + 1) AS approx_sim
        |  FROM probe p JOIN assign a USING (list_id)
        |  JOIN codes c ON c.vec_id = a.vec_id
        |  JOIN lutarr l ON l.q_id = p.q_id
        |  WHERE a.vec_id <> p.q_id),
        |shortlist AS (SELECT q_id, vec_id, list_id, approx_sim FROM (
        |  SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY approx_sim DESC, vec_id ASC) AS arn
        |  FROM scored) WHERE arn <= 20),
        |rerank AS (SELECT s.q_id, s.vec_id, s.list_id, s.approx_sim,
        |  ${sqlDot("q.qu", "e.u")} AS cos_sim
        |  FROM shortlist s JOIN e ON e.vec_id = s.vec_id
        |  JOIN q ON q.q_id = s.q_id),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos_sim DESC, vec_id ASC) AS rn
        |  FROM rerank)
        |SELECT q_id, rn::BIGINT AS rn, vec_id AS neighbor_id,
        |  list_id::BIGINT AS list_id, approx_sim, cos_sim
        |FROM ranked WHERE rn <= 3 ORDER BY q_id, rn"""))),
  )
}
