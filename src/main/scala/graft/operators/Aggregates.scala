package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Aggregation matrix (SURVEY.md §2.2 "Aggregations"): groupby-agg
  * families of the deployed dask library on Spark's partial/final
  * HashAggregate (map-side combine comes free — same split-apply-combine
  * dask runs, but codegen'd).
  *
  * Reference capability: dask.dataframe groupby-agg, provisioned by the image default at dask_ssh_docker/__init__.py:307 (SURVEY §2.2 Tier B).
  */
object Aggregates {

  /** Multi-agg with spread statistics per group (dask
    * `groupby(k).agg({'x':[...]})`). */
  val qStats: Q = Q(
    "q10_agg_stats",
    """SELECT c_nationkey,
      |  count(*) AS n, round(sum(c_acctbal), 2) / count(*) AS avg_bal,
      |  round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
      |  round(stddev_samp(c_acctbal), 4) AS sd_bal,
      |  round(var_samp(c_acctbal), 4) AS var_bal
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        (round(sum(col("c_acctbal")), 2) / count(lit(1))).as("avg_bal"),
        round(min(col("c_acctbal")), 2).as("min_bal"),
        round(max(col("c_acctbal")), 2).as("max_bal"),
        round(stddev_samp(col("c_acctbal")), 4).as("sd_bal"),
        round(var_samp(col("c_acctbal")), 4).as("var_bal"))
      .orderBy(col("c_nationkey"))
  }

  /** Exact distinct count per group (dask `groupby(k).x.nunique()`):
    * count(distinct user_id) by event_type — BASELINE.md anchor shape. */
  val qCountDistinct: Q = Q(
    "q11_count_distinct",
    """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** HyperLogLog distinct (dask `nunique_approx()`): the sketch estimate
    * is engine-specific, so the RAW estimate can't hash-match DuckDB —
    * but the estimate's tolerance against the exact count CAN, and does
    * (r8 directive #6): the registered form emits the exact per-type
    * distinct count (identical in any engine) plus a flag pinning the
    * HLL++ estimate within 5σ of it (rsd=0.02 → 10%; the sketch is
    * deterministic for fixed data, so the flag is stable run-to-run).
    * At 100 TB only the approx side is the production path — the exact
    * side here is the audit, the same pairing v84 uses for ANN recall. */
  val qApproxDistinct: Q = Q(
    "q12_approx_count_distinct",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact,
      |       true AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .select(col("event_type"), col("n_users_exact"),
        (abs(col("approx") - col("n_users_exact")) <=
          col("n_users_exact") * lit(0.10)).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** value_counts (dask `df.x.value_counts()`): group-count sorted desc. */
  val qValueCounts: Q = Q(
    "q13_value_counts",
    """SELECT event_type, count(*) AS cnt
      |FROM events GROUP BY event_type ORDER BY cnt DESC, event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col("event_type"))
  }

  /** Pivot (dask `pivot_table`): mktsegment × orderstatus revenue matrix.
    * Explicit value list keeps the plan single-pass (no distinct-scan) and
    * the output schema static — the 100 TB-safe form. */
  val qPivot: Q = Q(
    "q14_pivot",
    """SELECT c_mktsegment,
      |  round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS "F",
      |  round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS "O",
      |  round(coalesce(sum(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS "P"
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(coalesce(sum(col("o_totalprice")), lit(0)), 2))
      .orderBy(col("c_mktsegment"))
  }

  /** pandas `pivot_table(aggfunc=['count','mean'])` — a pivot carrying
    * TWO aggregates per category cell. Spark's `pivot().agg(a, b)`
    * compiles to one conditional hash aggregate (each cell a
    * FILTER-style branch), so the multi-agg costs the same single
    * shuffle as q14's one-agg pivot; column names follow Spark's
    * `<category>_<alias>` convention, pinned in the oracle. */
  val qPivotMultiAgg: Q = Q(
    "q131_pivot_multi_agg",
    """SELECT c_mktsegment,
      |  CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS BIGINT) AS "F_n",
      |  round(coalesce(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'F'), 0), 2) AS "F_avg_price",
      |  CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'O'), 0) AS BIGINT) AS "O_n",
      |  round(coalesce(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'O'), 0), 2) AS "O_avg_price",
      |  CAST(coalesce(count(*) FILTER (WHERE o_orderstatus = 'P'), 0) AS BIGINT) AS "P_n",
      |  round(coalesce(avg(o_totalprice) FILTER (WHERE o_orderstatus = 'P'), 0), 2) AS "P_avg_price"
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("n"),
        round(coalesce(avg(col("o_totalprice")), lit(0)), 2).as("avg_price"))
      .na.fill(0L, Seq("F_n", "O_n", "P_n"))
      .na.fill(0.0, Seq("F_avg_price", "O_avg_price", "P_avg_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** Per-group winsorization (scipy `winsorize` / pandas clip-at-
    * quantiles): values outside each group's [p05, p95] clamp to the
    * boundary — the standard outlier treatment before model features.
    * Same two-phase shape as q103's qcut: exact per-group percentiles
    * (rounded, so both engines clip at identical literals) ride a
    * k-row broadcast back onto the fat table; one scan, one shuffle for
    * the boundary aggregate, map-side clip. Reported per group: clipped
    * count + winsorized mean/max. */
  val qWinsorize: Q = Q(
    "q132_winsorize_per_group",
    """WITH b AS (SELECT event_type,
      |    round(quantile_cont(value, 0.05), 6) AS lo,
      |    round(quantile_cont(value, 0.95), 6) AS hi
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(CAST(value < lo OR value > hi AS BIGINT)) AS BIGINT) AS n_clipped,
      |  round(avg(least(greatest(value, lo), hi)), 6) AS wmean,
      |  round(max(least(greatest(value, lo), hi)), 6) AS wmax
      |FROM events e JOIN b USING (event_type)
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val bounds = ev.groupBy(col("event_type")).agg(
      round(percentile(col("value"), lit(0.05)), 6).as("lo"),
      round(percentile(col("value"), lit(0.95)), 6).as("hi"))
    val clipped = least(greatest(col("value"), col("lo")), col("hi"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum((col("value") < col("lo") || col("value") > col("hi")).cast("long"))
          .as("n_clipped"),
        round(avg(clipped), 6).as("wmean"),
        round(max(clipped), 6).as("wmax"))
      .orderBy(col("event_type"))
  }

  /** Rollup (beyond the dask API — SURVEY §2.2 flags grouping sets as the
    * free Spark upgrade): region → nation hierarchy totals. */
  val qRollup: Q = Q(
    "q15_rollup",
    """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
      |       count(*) AS n, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region, nation""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n"), round(sum(col("c_acctbal")), 2).as("total_bal"))
      .select(coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n"), col("total_bal"))
      .orderBy(col("region"), col("nation"))
  }

  /** Cube over two independent dimensions. */
  val qCube: Q = Q(
    "q16_cube",
    """SELECT coalesce(event_type, 'ALL') AS etype,
      |       coalesce(CAST(year(ts) AS VARCHAR), 'ALL') AS yr,
      |       count(*) AS n
      |FROM events GROUP BY CUBE(event_type, year(ts))
      |ORDER BY etype, yr""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .withColumn("yr0", year(col("ts")))
      .cube(col("event_type"), col("yr0"))
      .agg(count(lit(1)).as("n"))
      .select(coalesce(col("event_type"), lit("ALL")).as("etype"),
        coalesce(col("yr0").cast("string"), lit("ALL")).as("yr"),
        col("n"))
      .orderBy(col("etype"), col("yr"))
  }

  /** Exact percentiles (dask `quantile`/`describe` analog; Spark
    * `percentile` ≡ DuckDB `quantile_cont` linear interpolation). */
  val qQuantiles: Q = Q(
    "q17_quantiles",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25"),
        round(percentile(col("l_extendedprice"), lit(0.50)), 4).as("p50"),
        round(percentile(col("l_extendedprice"), lit(0.75)), 4).as("p75"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99"))
      .orderBy(col("l_returnflag"))
  }

  /** Correlation / covariance (dask `df.corr()/cov()`). */
  val qCorr: Q = Q(
    "q18_corr_cov",
    """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |       round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
      |       round(corr(l_discount, l_tax), 6) AS corr_disc_tax
      |FROM lineitem""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).agg(
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
      round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"),
      round(corr(col("l_discount"), col("l_tax")), 6).as("corr_disc_tax"))
  }

  /** argmin/argmax (dask `idxmax` analog): per nation, the customer with
    * the max/min account balance. Spark side: max_by/min_by with a struct
    * tie-breaker (sf0.1 has duplicate balances per nation); oracle side:
    * row_number with matching tie-break order (DuckDB arg-funcs don't take
    * composite orderings) — different plan, same deterministic result. */
  val qMinMaxBy: Q = Q(
    "q19_min_max_by",
    """SELECT c_nationkey,
      |  max(CASE WHEN rhi = 1 THEN c_custkey END) AS richest,
      |  max(CASE WHEN rlo = 1 THEN c_custkey END) AS poorest
      |FROM (SELECT c_nationkey, c_custkey,
      |        row_number() OVER (PARTITION BY c_nationkey
      |          ORDER BY c_acctbal DESC, c_custkey DESC) AS rhi,
      |        row_number() OVER (PARTITION BY c_nationkey
      |          ORDER BY c_acctbal ASC, c_custkey ASC) AS rlo
      |      FROM customer) t
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(
        max_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("richest"),
        min_by(col("c_custkey"), struct(col("c_acctbal"), col("c_custkey"))).as("poorest"))
      .orderBy(col("c_nationkey"))
  }

  /** Ungrouped full-column reductions (dask `df.x.sum()` etc.). */
  val qGlobalAgg: Q = Q(
    "q20_global_reduce",
    """SELECT count(*) AS n, round(sum(o_totalprice), 2) AS total,
      |       round(sum(o_totalprice), 2) / count(*) AS mean,
      |       round(min(o_totalprice), 2) AS lo, round(max(o_totalprice), 2) AS hi,
      |       count(DISTINCT o_custkey) AS n_customers
      |FROM orders""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).agg(
      count(lit(1)).as("n"),
      round(sum(col("o_totalprice")), 2).as("total"),
      (round(sum(col("o_totalprice")), 2) / count(lit(1))).as("mean"),
      round(min(col("o_totalprice")), 2).as("lo"),
      round(max(col("o_totalprice")), 2).as("hi"),
      countDistinct(col("o_custkey")).as("n_customers"))
  }

  /** Approximate percentiles (Greenwald-Khanna sketch — the dask
    * `quantile` default): the sketch value is engine-specific, so the
    * raw approx can't hash-match DuckDB — but its rank-error contract
    * CAN (r8 directive #6): accuracy=1000 bounds rank error to n/1000,
    * so the approx p50/p99 must land between the exact percentiles at
    * p∓0.02 / p∓0.005 — a 20–5× slack over the guarantee. The
    * registered form emits the EXACT interpolated percentiles (which
    * both engines compute identically, q17's pattern) plus the
    * containment flags; the sketch is deterministic for fixed data so
    * the flags are stable. */
  val qApproxQuantiles: Q = Q(
    "q82_percentile_approx",
    """SELECT l_returnflag,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
      |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
      |  true AS p50_ok, true AS p99_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).groupBy(col("l_returnflag"))
      .agg(
        round(percentile(col("l_extendedprice"), lit(0.50)), 4).as("p50_exact"),
        round(percentile(col("l_extendedprice"), lit(0.99)), 4).as("p99_exact"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a50"),
        percentile(col("l_extendedprice"), lit(0.48)).as("lo50"),
        percentile(col("l_extendedprice"), lit(0.52)).as("hi50"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("a99"),
        percentile(col("l_extendedprice"), lit(0.985)).as("lo99"),
        percentile(col("l_extendedprice"), lit(0.995)).as("hi99"))
      .select(col("l_returnflag"), col("p50_exact"), col("p99_exact"),
        col("a50").between(col("lo50"), col("hi50")).as("p50_ok"),
        col("a99").between(col("lo99"), col("hi99")).as("p99_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles via histogram pruning: pass 1
    * aggregates per-bucket counts (map-side partial combine — only
    * #buckets rows ever shuffle), pass 2 ranks ONLY the straddle buckets
    * whose global rank interval contains a target position (≤ 2 tiny
    * buckets per percentile, broadcast-joined), then interpolates the two
    * straddling rows arithmetically. The fat table is never globally
    * sorted or shuffled — unlike the rank-everything form (one full
    * bucketed shuffle) or Spark's own `percentile` (every value in ONE
    * aggregation buffer per group; fine for bounded domains like q17's
    * per-flag quantity, a scale-killer for high-cardinality columns at
    * 100 TB). Interpolation arithmetic matches percentile_cont.
    * `bucket` must be a deterministic monotone banding of the value
    * (equal values share a bucket), #buckets O(100s–1000s).
    * Returns a 1-row frame with one column per requested percentile. */
  private[graft] def sortedQuantiles(df: org.apache.spark.sql.DataFrame,
      value: org.apache.spark.sql.Column,
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      ps: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.select(value.as("v")).filter(col("v").isNotNull)
      .withColumn("_sq_b", bucket(col("v")))
    val counts = vals.groupBy(col("_sq_b")).agg(count(lit(1)).as("_sq_cnt"))
    // offset = #rows in strictly-earlier buckets (shared Scale helper)
    val offsets = Scale.bucketOffsets(counts, "_sq_b", "_sq_cnt", "_sq_off")
      .select(col("_sq_b").as("_sq_bo"), col("_sq_cnt").as("_sq_c"), col("_sq_off"))
    val n = counts.agg(sum(col("_sq_cnt")).as("qn")) // no extra scan of df
    // a bucket is a straddle iff its rank interval [off+1, off+cnt]
    // intersects {lo, lo+1} for some requested percentile
    val straddleCond = ps.map { case (_, p) =>
      val lo = floor((col("qn") - 1) * p) + 1
      col("_sq_off") < lo + 1 && col("_sq_off") + col("_sq_c") >= lo
    }.reduce(_ || _)
    val straddle = offsets.join(broadcast(n), lit(true)).filter(straddleCond)
      .select(col("_sq_bo"), col("_sq_off"))
    val ranked = vals.join(broadcast(straddle), col("_sq_b") === col("_sq_bo"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("_sq_b")).orderBy(col("v"))) + col("_sq_off"))
    val aggs = ps.map { case (name, p) =>
      val pos = (col("qn") - 1) * p // 0-indexed fractional position
      val lo = floor(pos) + 1 // 1-indexed rank of the lower straddle row
      val frac = pos - floor(pos)
      sum(when(col("rn") === lo, col("v") * (lit(1.0) - frac))
        .when(col("rn") === lo + 1, col("v") * frac)).as(name)
    }
    ranked.join(broadcast(n), lit(true)).agg(aggs.head, aggs.tail: _*)
  }

  /** One-call summary statistics (dask/pandas `describe()`): count, mean,
    * std, min, exact quartiles, max for two numeric columns, emitted in
    * pandas' long layout (one row per statistic) — one distributed agg
    * for the algebraic stats + a sort-rank pass per column for exact
    * quartiles, then an 8-row stack() of the scalar results. */
  val qDescribe: Q = Q(
    "q90_describe",
    """WITH a AS (SELECT
      |  CAST(count(l_quantity) AS DOUBLE) AS qc, round(avg(l_quantity), 4) AS qm,
      |  round(stddev_samp(l_quantity), 4) AS qsd, CAST(min(l_quantity) AS DOUBLE) AS qmn,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS q25,
      |  round(quantile_cont(l_quantity, 0.50), 4) AS q50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS q75,
      |  CAST(max(l_quantity) AS DOUBLE) AS qmx,
      |  CAST(count(l_extendedprice) AS DOUBLE) AS pc, round(avg(l_extendedprice), 4) AS pm,
      |  round(stddev_samp(l_extendedprice), 4) AS psd,
      |  CAST(min(l_extendedprice) AS DOUBLE) AS pmn,
      |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
      |  round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
      |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
      |  CAST(max(l_extendedprice) AS DOUBLE) AS pmx
      |  FROM lineitem)
      |SELECT stat, l_quantity, l_extendedprice FROM (
      |  SELECT 'count' AS stat, qc AS l_quantity, pc AS l_extendedprice FROM a
      |  UNION ALL SELECT 'mean', qm, pm FROM a
      |  UNION ALL SELECT 'std', qsd, psd FROM a
      |  UNION ALL SELECT 'min', qmn, pmn FROM a
      |  UNION ALL SELECT '25%', q25, p25 FROM a
      |  UNION ALL SELECT '50%', q50, p50 FROM a
      |  UNION ALL SELECT '75%', q75, p75 FROM a
      |  UNION ALL SELECT 'max', qmx, pmx FROM a
      |) t ORDER BY stat""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val qQuarts = sortedQuantiles(li, col("l_quantity"), v => floor(v / 5),
      Seq("rq25" -> 0.25, "rq50" -> 0.50, "rq75" -> 0.75))
    val pQuarts = sortedQuantiles(li, col("l_extendedprice"), v => floor(v / 5000),
      Seq("rp25" -> 0.25, "rp50" -> 0.50, "rp75" -> 0.75))
    val a = li.agg(
      count(col("l_quantity")).cast("double").as("qc"),
      round(avg(col("l_quantity")), 4).as("qm"),
      round(stddev_samp(col("l_quantity")), 4).as("qsd"),
      min(col("l_quantity")).cast("double").as("qmn"),
      max(col("l_quantity")).cast("double").as("qmx"),
      count(col("l_extendedprice")).cast("double").as("pc"),
      round(avg(col("l_extendedprice")), 4).as("pm"),
      round(stddev_samp(col("l_extendedprice")), 4).as("psd"),
      min(col("l_extendedprice")).cast("double").as("pmn"),
      max(col("l_extendedprice")).cast("double").as("pmx"))
      .join(broadcast(qQuarts), lit(true)).join(broadcast(pQuarts), lit(true))
      .select(col("*"),
        round(col("rq25"), 4).as("q25"), round(col("rq50"), 4).as("q50"),
        round(col("rq75"), 4).as("q75"),
        round(col("rp25"), 4).as("p25"), round(col("rp50"), 4).as("p50"),
        round(col("rp75"), 4).as("p75"))
    a.selectExpr(
      """stack(8,
        |'count', qc, pc, 'mean', qm, pm, 'std', qsd, psd, 'min', qmn, pmn,
        |'25%', q25, p25, '50%', q50, p50, '75%', q75, p75, 'max', qmx, pmx)
        |AS (stat, l_quantity, l_extendedprice)""".stripMargin)
      .orderBy(col("stat"))
  }

  /** `groupby().transform` (dask/pandas): a per-group statistic broadcast
    * back onto every row — here the within-customer z-score of order
    * totals. One unbounded window frame per group (no join-back needed);
    * single-order customers get null stddev → null z, pinned identically
    * in the oracle. */
  val qGroupTransform: Q = Q(
    "q97_group_transform",
    """SELECT o_orderkey, o_custkey,
      |  round((o_totalprice - avg(o_totalprice) OVER w)
      |        / stddev_samp(o_totalprice) OVER w, 6) AS z_in_cust
      |FROM orders WHERE o_custkey <= 200
      |WINDOW w AS (PARTITION BY o_custkey)
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, d).filter(col("o_custkey") <= 200)
      .select(col("o_orderkey"), col("o_custkey"),
        round((col("o_totalprice") - avg(col("o_totalprice")).over(w))
          / stddev_samp(col("o_totalprice")).over(w), 6).as("z_in_cust"))
      .orderBy(col("o_orderkey"))
  }

  /** Fixed-width binning (pandas/dask `cut`): histogram of prices in
    * 10k-wide bins with per-bin stats. Bin assignment is pure arithmetic
    * in the projection — the map-side-combined groupBy ships only
    * #bins rows per partition. (Quantile binning `qcut` = the same shape
    * with sortedQuantiles/percentile_approx boundaries.) */
  val qBinning: Q = Q(
    "q99_cut_binning",
    """SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bin,
      |  count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price,
      |  CAST(min(l_extendedprice) AS DOUBLE) AS lo,
      |  CAST(max(l_extendedprice) AS DOUBLE) AS hi
      |FROM lineitem GROUP BY bin ORDER BY bin""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .withColumn("bin", floor(col("l_extendedprice") / 10000).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), round(avg(col("l_extendedprice")), 4).as("avg_price"),
        min(col("l_extendedprice")).cast("double").as("lo"),
        max(col("l_extendedprice")).cast("double").as("hi"))
      .orderBy(col("bin"))
  }

  /** Quantile binning (pandas/dask `qcut`): quartile boundaries from the
    * histogram-pruned exact quantiles (a 1-row broadcast — no collect),
    * then arithmetic bin assignment + per-bin stats. Rows equal to a
    * boundary go to the lower bin (`> b` comparisons), pinned identically
    * in the oracle. */
  val qQcut: Q = Q(
    "q100_qcut_binning",
    """WITH b AS (SELECT
      |    quantile_cont(l_extendedprice, 0.25) AS q1,
      |    quantile_cont(l_extendedprice, 0.50) AS q2,
      |    quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem)
      |SELECT CAST(CAST(l_extendedprice > q1 AS BIGINT)
      |            + CAST(l_extendedprice > q2 AS BIGINT)
      |            + CAST(l_extendedprice > q3 AS BIGINT) AS BIGINT) AS qbin,
      |  count(*) AS n, round(avg(l_extendedprice), 4) AS avg_price
      |FROM lineitem, b GROUP BY qbin ORDER BY qbin""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val bounds = sortedQuantiles(li, col("l_extendedprice"), v => floor(v / 5000),
      Seq("q1" -> 0.25, "q2" -> 0.50, "q3" -> 0.75))
    li.join(broadcast(bounds), lit(true))
      .withColumn("qbin",
        ((col("l_extendedprice") > col("q1")).cast("long")
          + (col("l_extendedprice") > col("q2")).cast("long")
          + (col("l_extendedprice") > col("q3")).cast("long")))
      .groupBy(col("qbin"))
      .agg(count(lit(1)).as("n"), round(avg(col("l_extendedprice")), 4).as("avg_price"))
      .orderBy(col("qbin"))
  }

  /** Per-group mode (dask `Series.mode` per group): most frequent
    * event_type per user, via Spark's native deterministic `mode`
    * aggregate (ties → lowest value). The oracle mirrors the tie-break
    * explicitly (count desc, value asc) rather than relying on DuckDB's
    * own `mode()`, whose tie behavior is unspecified. */
  val qGroupMode: Q = Q(
    "q102_group_mode",
    """SELECT user_id, event_type AS modal_type FROM (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY count(*) DESC, event_type) AS rn
      |  FROM events WHERE user_id < 50
      |  GROUP BY user_id, event_type) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .agg(mode(col("event_type"), deterministic = true).as("modal_type"))
      .orderBy(col("user_id"))
  }

  /** Per-group qcut (dask `groupby.quantile` + binning): quartile
    * boundaries computed WITHIN each event_type, then every event binned
    * against its own group's boundaries. The boundary table is one row
    * per group (5 here) → broadcast back onto the fat side; quartiles
    * rounded to 6 decimals on both engines so the bin comparison can't
    * flip on a last-ulp interpolation difference. */
  val qQcutPerGroup: Q = Q(
    "q103_qcut_per_group",
    """WITH b AS (SELECT event_type,
      |    round(quantile_cont(value, 0.25), 6) AS q1,
      |    round(quantile_cont(value, 0.50), 6) AS q2,
      |    round(quantile_cont(value, 0.75), 6) AS q3
      |  FROM events GROUP BY event_type)
      |SELECT e.event_type,
      |  CAST(CAST(value > q1 AS BIGINT) + CAST(value > q2 AS BIGINT)
      |       + CAST(value > q3 AS BIGINT) AS BIGINT) AS qbin,
      |  CAST(count(*) AS BIGINT) AS n, round(avg(value), 4) AS avg_value
      |FROM events e JOIN b USING (event_type)
      |GROUP BY e.event_type, qbin ORDER BY e.event_type, qbin""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val bounds = ev.groupBy(col("event_type")).agg(
      round(percentile(col("value"), lit(0.25)), 6).as("q1"),
      round(percentile(col("value"), lit(0.50)), 6).as("q2"),
      round(percentile(col("value"), lit(0.75)), 6).as("q3"))
    ev.join(broadcast(bounds), Seq("event_type"))
      .withColumn("qbin",
        ((col("value") > col("q1")).cast("long")
          + (col("value") > col("q2")).cast("long")
          + (col("value") > col("q3")).cast("long")))
      .groupBy(col("event_type"), col("qbin"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("event_type"), col("qbin"))
  }

  /** Weighted per-group statistics (pandas' `np.average(x, weights=w)`
    * groupby-apply): quantity-weighted mean price/discount and weighted
    * discount variance, all as plain sum ratios — sum(w·x)/sum(w) and
    * the algebraic E[x²]−E[x]² form — so the whole thing is ONE
    * map-side-combined hash aggregate, no second centered pass and no
    * window. The variance rides the small-magnitude discount column on
    * purpose: the algebraic form cancels catastrophically on large
    * values (price² ~1e9) but is exact-to-6-decimals on [0,0.1]. */
  val qWeightedStats: Q = Q(
    "q129_weighted_group_stats",
    """SELECT l_returnflag,
      |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
      |    AS wmean_price,
      |  round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wmean_disc,
      |  round(sum(l_quantity * l_discount * l_discount) / sum(l_quantity)
      |        - (sum(l_discount * l_quantity) / sum(l_quantity))
      |          * (sum(l_discount * l_quantity) / sum(l_quantity)), 6)
      |    AS wvar_disc
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val wmDisc = sum(col("l_discount") * col("l_quantity")) / sum(col("l_quantity"))
    li.groupBy(col("l_returnflag"))
      .agg(
        round(sum(col("l_extendedprice") * col("l_quantity"))
          / sum(col("l_quantity")), 2).as("wmean_price"),
        round(wmDisc, 6).as("wmean_disc"),
        round(sum(col("l_quantity") * col("l_discount") * col("l_discount"))
          / sum(col("l_quantity")) - wmDisc * wmDisc, 6).as("wvar_disc"))
      .orderBy(col("l_returnflag"))
  }

  /** pivot_table(margins=True): the contingency table WITH its 'All'
    * totals row and total column (pandas margins). Row margin rides the
    * ROLLUP (one extra grouping set on the same shuffle); the column
    * margin is just another conditional count — no second scan, no
    * union of aggregates. */
  val qPivotMargins: Q = Q(
    "q169_pivot_margins",
    """SELECT coalesce(event_type, 'All') AS event_type,
      |  CAST(count(*) FILTER (WHERE hour(ts) < 12) AS BIGINT) AS am,
      |  CAST(count(*) FILTER (WHERE hour(ts) >= 12) AS BIGINT) AS pm,
      |  CAST(count(*) AS BIGINT) AS total
      |FROM events GROUP BY ROLLUP(event_type)
      |ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .rollup(col("event_type"))
      .agg(count(when(hour(col("ts")) < 12, 1)).as("am"),
        count(when(hour(col("ts")) >= 12, 1)).as("pm"),
        count(lit(1)).as("total"))
      .select(coalesce(col("event_type"), lit("All")).as("event_type"),
        col("am"), col("pm"), col("total"))
      .orderBy(col("event_type"))
  }

  /** WEIGHTED median (the order statistic q129's weighted moments
    * can't express: half the QUANTITY lies at or below this price).
    * Lower-median convention: the smallest x whose running weight
    * reaches half the group total.
    *
    * The oracle states the semantics as one per-group running sum; the
    * Spark plan computes the SAME running weight banded — l_returnflag
    * has 3 values, so a per-group window would put a third of a 100 TB
    * corpus in one partition. Instead: quantile-band x (≤64 data-derived
    * bands), aggregate per-(group, band) weights into a groups×bands-row
    * table, locate each group's THRESHOLD band (the one whose cumulative
    * weight crosses half the total — a window over ≤192 rows), and run
    * the running-sum window only over rows of that single band
    * (≈ N/bands rows; raise the band count to shrink the partition at
    * scale). The r7 form windowed EVERY band and offset-joined — correct,
    * but it sorted the whole table and needed a checkpoint to stop three
    * consumers re-scanning (4.9 s warm, registry max); locating the
    * threshold band first windows 1/64th of the data and nothing is
    * materialized. Banding is EXACT, not just equivalent-in-the-limit:
    * by monotonicity the global threshold row lies in the threshold band,
    * quantities are integral so partial sums are the same numbers under
    * any association, and tie rows share an x, so which tie crosses the
    * threshold cannot change the filtered MIN. */
  val qWeightedMedian: Q = Q(
    "q174_weighted_median",
    """WITH c AS (SELECT l_returnflag AS k, l_extendedprice AS x,
      |             sum(l_quantity) OVER (PARTITION BY l_returnflag
      |               ORDER BY l_extendedprice, l_orderkey, l_linenumber
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |             sum(l_quantity) OVER (PARTITION BY l_returnflag) AS tot
      |           FROM lineitem)
      |SELECT k AS l_returnflag, round(min(x), 2) AS weighted_median,
      |       round(max(tot), 2) AS total_weight
      |FROM c WHERE cw >= tot / 2 GROUP BY k ORDER BY k""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, d).select(col("l_returnflag").as("k"),
      col("l_extendedprice").as("x"), col("l_quantity").as("wt"),
      col("l_orderkey"), col("l_linenumber"))
    val edges = graft.operators.Scale.quantileEdges(li, Seq(col("x")), 64).head
    val withB = li.withColumn("_b",
      graft.operators.Scale.bucketsFromEdges(col("x"), edges))
    // groups×bands weight table (≤192 rows) → cumulative offsets and
    // totals are a broadcast-sized window, then pick the threshold band
    val wOff = Window.partitionBy(col("k")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = withB.groupBy(col("k"), col("_b")).agg(sum(col("wt")).as("_bw"))
      .withColumn("_off", coalesce(sum(col("_bw")).over(wOff), lit(0.0)))
      .withColumn("tot", sum(col("_bw")).over(Window.partitionBy(col("k"))))
    val thr = cum.filter(col("_off") + col("_bw") >= col("tot") / 2)
      .groupBy(col("k"))
      .agg(min_by(struct(col("_b"), col("_off"), col("tot")), col("_b")).as("s"))
      .select(col("k").as("_tk"), col("s._b").as("_tb"),
        col("s._off").as("_toff"), col("s.tot").as("tot"))
    // second scan touches only the threshold band's rows; the window
    // partition is one band per group
    val wLoc = Window.partitionBy(col("k"))
      .orderBy(col("x"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.join(broadcast(thr),
        col("k") === col("_tk") && col("_b") === col("_tb"))
      .withColumn("_cwl", sum(col("wt")).over(wLoc))
      .filter(col("_toff") + col("_cwl") >= col("tot") / 2)
      .groupBy(col("k"))
      .agg(round(min(col("x")), 2).as("weighted_median"),
        round(max(col("tot")), 2).as("total_weight"))
      .select(col("k").as("l_returnflag"), col("weighted_median"),
        col("total_weight"))
      .orderBy(col("l_returnflag"))
  }

  /** INCREMENTAL aggregate maintenance (the warehouse rollup pattern:
    * yesterday's materialized partial state + today's delta = the new
    * rollup, WITHOUT rescanning history). The Spark plan aggregates the
    * two date slices separately into (count, sum) PARTIALS and merges
    * them — sum of sums, count of counts, avg derived at the end; the
    * oracle computes the same stats in one direct pass, so the hash
    * compare PROVES the re-aggregation algebra (what makes sum/count/avg
    * incrementally maintainable while median is not). At scale the
    * "yesterday" side is a tiny stored table, not a scan. */
  val qIncrementalAggMerge: Q = Q(
    "q176_incremental_agg_merge",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |       round(sum(value), 2) AS total, round(sum(value) / count(*), 6)
      |         AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    def partial(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("pn"), sum(col("value")).as("ps"))
    val history = partial(ev.filter(dayofmonth(col("ts")) < 15))
    val delta = partial(ev.filter(dayofmonth(col("ts")) >= 15))
    history.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("pn")).as("n"), round(sum(col("ps")), 2).as("total"),
        round(sum(col("ps")) / sum(col("pn")), 6).as("avg_value"))
      .orderBy(col("event_type"))
  }

  /** MERGEABLE DISTINCT-COUNT SKETCHES (the incremental companion to
    * q176's sum/count partial merge — the algebra that makes DISTINCT
    * incrementally maintainable, which plain countDistinct is not):
    * per-day HyperLogLog sketches (Spark's Apache DataSketches HLL
    * surface) merged with hll_union_agg, against the whole-table sketch
    * and the exact count. At 100 TB the per-day sketches are a few-KB
    * stored column per partition; "distinct users this quarter" is then
    * a union of 90 stored sketches, never a rescan. The output pins the
    * invariant mechanically: union-of-partials must land within the
    * sketch's error band of the whole-table sketch, while rel_err vs
    * exact stays inside the sketch's error bound. NOT pinned as exact
    * register equality — the r10 claim "union == direct sketch" held
    * only in sparse mode: the round-11 sf0.1 sweep showed DataSketches
    * HLL_4 union (which routes through an HLL_8 gadget and downgrades)
    * legitimately producing a slightly different estimate than the
    * directly-built sketch once past the sparse→dense transition
    * (observed at 1500 distincts; equal at sf0.01's ~500). The honest
    * mergeability contract is estimate-equivalence within the error
    * band, which is what incremental maintenance needs. Registered form
    * (r10/r11 invariant-oracle pattern): n_days and the exact distinct
    * count replay in DuckDB, `merged_within_err` pins union≈whole at
    * ±2% (>1σ of the ~1.6% lgK=12 σ applied to BOTH estimates' common
    * base), and the sketch estimate must sit within ±10% of exact.
    * DedupSpec keeps the raw estimate shape. */
  private[graft] def hllMergeRaw(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged_est"),
      count(lit(1)).as("n_days"))
    val whole = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("whole_est"),
      countDistinct(col("user_id")).as("exact"))
    merged.crossJoin(whole)
  }

  val qHllMerge: Q = Q(
    "q188_hll_partition_merge",
    """SELECT CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact,
      |       true AS merged_within_err, true AS rel_err_ok
      |FROM events""".stripMargin
  ) { (s, d) =>
    hllMergeRaw(s, d)
      .select(col("n_days"), col("exact"),
        (abs(col("merged_est") - col("whole_est"))
          <= greatest(col("whole_est") * 0.02, lit(1.0)))
          .as("merged_within_err"),
        (abs(col("merged_est") - col("exact")) / col("exact") <= 0.1)
          .as("rel_err_ok"))
  }

  /** ADAPTIVE HISTOGRAM (Ben-Haim/Tom-Tov streaming histogram — Spark's
    * `histogram_numeric`): data-placed bin centers from one pass, the
    * third histogram regime next to q99's fixed-width bins and q100's
    * quantile bins — right when the distribution's shape is unknown up
    * front (long tails collapse to few wide bins, dense regions get
    * narrow ones). Raw bins for the spec / exploration. */
  private[graft] def adaptiveHistBins(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.events(s, d)
      .agg(expr("histogram_numeric(value, 8)").as("h"))
      .select(posexplode(col("h")).as(Seq("bin", "b")))
      .select(col("bin"), col("b.x").as("center"), col("b.y").as("height"))
      .orderBy(col("bin"))

  /** Registered form: sketch merges are order-sensitive (centers shift
    * slightly with partial-merge order), so the raw bins can't hash-
    * match another engine — but the sketch's EXACT invariants can, and
    * DO get a full DuckDB oracle (r8 directive #6): bin count (8 — the
    * fixture has ≥8 distinct values), heights summing to the non-null
    * row count (mass conservation is exact: heights are integer-valued
    * doubles, merges only add them), centers inside the exact [min,max]
    * envelope, and strictly increasing. The raw-bin shape stays pinned
    * in GraftSpec. The 8-row single-partition window is on the SKETCH
    * output, not the data — scale-safe. */
  val qAdaptiveHistogram: Q = Q(
    "q190_adaptive_histogram",
    """SELECT CAST(8 AS BIGINT) AS n_bins,
      |       CAST(count(value) AS BIGINT) AS total_count,
      |       true AS centers_in_range, true AS centers_increasing
      |FROM events""".stripMargin
  ) { (s, d) =>
    val bins = adaptiveHistBins(s, d)
    val env = Tables.events(s, d)
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("bin"))
    bins.withColumn("prev", lag(col("center"), 1).over(w))
      .crossJoin(broadcast(env))
      .agg(count(lit(1)).as("n_bins"),
        round(sum(col("height"))).cast("long").as("total_count"),
        min(col("center") >= col("lo") && col("center") <= col("hi"))
          .as("centers_in_range"),
        min(col("prev").isNull || col("prev") < col("center"))
          .as("centers_increasing"))
  }

  /** ORDERED STRING AGGREGATION (SQL string_agg / pandas
    * `groupby.agg(','.join)` with a DETERMINISTIC element order —
    * without the ORDER BY the result is partition-order garbage):
    * Spark has no ordered listagg, so the plan collects
    * (sort-key, value) structs, `array_sort`s the bounded per-group
    * array (struct compare = lexicographic, sort key first), projects
    * the values and joins. The bounded-group contract is LOUD (r10
    * verdict task 4, the `Joins.mergeValidated` pattern): a window
    * count over the same grouping key — Catalyst reuses the exchange,
    * so no extra shuffle — feeds an in-plan `assert_true(count <= cap)`
    * that fails the job BEFORE `collect_list` ever buffers an unbounded
    * group, instead of the silent driver/executor OOM a documented-only
    * contract risks at 100 TB. */
  def orderedStringAgg(df: org.apache.spark.sql.DataFrame, key: String,
      value: String, nOut: String, rosterOut: String,
      cap: Long = 100000L): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    // pick a helper name absent from the frame (withColumn REPLACES an
    // existing column silently — the mergeValidated discipline)
    val cnt = Iterator.from(1)
      .map(i => if (i == 1) "_osa_cnt" else s"_osa_cnt$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(cnt, count(lit(1)).over(w))
      .filter(assert_true(col(cnt) <= cap,
        concat(lit(s"orderedStringAgg: group exceeds cap $cap ("),
          col(key).cast("string"), lit(")"))).isNull)
      .groupBy(col(key))
      .agg(count(lit(1)).as(nOut),
        array_join(array_sort(collect_list(col(value))), ",").as(rosterOut))
  }

  /** Group sizes here are nation-bounded (≤ ~100 suppliers), far under
    * the cap; the cap exists so a mis-keyed caller fails loudly. */
  val qOrderedStringAgg: Q = Q(
    "q191_ordered_string_agg",
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
      |       string_agg(s_name, ',' ORDER BY s_name) AS roster
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin
  ) { (s, d) =>
    orderedStringAgg(Tables.supplier(s, d), "s_nationkey", "s_name",
      "n_suppliers", "roster")
      .orderBy(col("s_nationkey"))
  }

  /** CUMULATIVE DISTINCT REACH (running "users ever seen" by day — the
    * audience-growth curve; the cumulative complement of q164's
    * new/retained/churned accounting). Naive spelling is a running
    * COUNT(DISTINCT) — unbounded state per day; the scale form
    * attributes each user to their FIRST day (one groupBy), counts new
    * users per day, and runs one cumulative sum over the O(calendar
    * days) aggregate series — the q125 bound: the global window sees
    * days, never users. */
  val qCumulativeReach: Q = Q(
    "q192_cumulative_reach",
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS d
      |           FROM events GROUP BY user_id),
      |daily AS (SELECT d, CAST(count(*) AS BIGINT) AS new_users
      |          FROM f GROUP BY d)
      |SELECT d, new_users,
      |       CAST(sum(new_users) OVER (ORDER BY d
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS users_ever
      |FROM daily ORDER BY d""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("user_id")).agg(min(col("ts").cast("date")).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("new_users"))
    daily.withColumn("users_ever",
        sum(col("new_users")).over(Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("d"))
  }

  val all: Seq[Q] = Seq(qStats, qCountDistinct, qApproxDistinct, qValueCounts,
    qApproxQuantiles,
    qPivot, qRollup, qCube, qQuantiles, qCorr, qMinMaxBy, qGlobalAgg, qDescribe,
    qGroupTransform, qBinning, qQcut, qGroupMode, qQcutPerGroup, qWeightedStats,
    qPivotMultiAgg, qWinsorize, qPivotMargins, qWeightedMedian,
    qIncrementalAggMerge, qHllMerge, qAdaptiveHistogram, qOrderedStringAgg,
    qCumulativeReach)
}
