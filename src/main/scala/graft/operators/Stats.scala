package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Statistical-inference surface: grouped OLS regression, chi-squared
  * independence, and Gini concentration. The scipy/statsmodels ops a
  * user of the reference image runs driver-side after a Dask collect
  * (dask_ssh_docker/__init__.py:307 provisions the scipy stack); here
  * each is a fully distributed aggregate — the raw table is scanned
  * once, every "statistic table" (contingency cells, group moments,
  * rank table) is category- or user-bounded, and the final statistic is
  * a scalar aggregate, so the shapes are unchanged at 100 TB.
  */
object Stats {

  /** Grouped simple OLS (y = extendedprice on x = quantity per return
    * flag) via the SQL-standard regr_* aggregates — one hash aggregate
    * with map-side partials, the moment-based closed form (never a
    * per-group solver). Slope/intercept rounded to 3 (the two engines'
    * moment accumulation orders differ in the last ~2 ulps at 60k rows);
    * r² and the means to 6. */
  val qOls: Q = Q(
    "q149_ols_regression",
    """SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(regr_slope(l_extendedprice, l_quantity), 3) AS slope,
      |       round(regr_intercept(l_extendedprice, l_quantity), 3) AS intercept,
      |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
      |       round(avg(l_quantity), 6) AS avg_x
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(expr("regr_slope(l_extendedprice, l_quantity)"), 3).as("slope"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)"), 3).as("intercept"),
        round(expr("regr_r2(l_extendedprice, l_quantity)"), 6).as("r2"),
        round(avg(col("l_quantity")), 6).as("avg_x"))
      .orderBy(col("l_returnflag"))
  }

  /** Chi-squared test of independence for event_type × daypart: observed
    * contingency cells from ONE hash aggregate; row/column marginals are
    * category-bounded re-aggregations of those cells (the raw table is
    * not rescanned); expected = row·col/N; χ² = Σ(o−e)²/e. Degrees of
    * freedom computed from the marginal cardinalities, not hardcoded. */
  val qChi2: Q = Q(
    "q150_chi2_independence",
    """WITH obs AS (
      |  SELECT event_type,
      |         CASE WHEN hour(ts) < 6 THEN 'night'
      |              WHEN hour(ts) < 12 THEN 'morning'
      |              WHEN hour(ts) < 18 THEN 'afternoon'
      |              ELSE 'evening' END AS daypart,
      |         CAST(count(*) AS BIGINT) AS o
      |  FROM events GROUP BY event_type, daypart),
      |rt AS (SELECT event_type, sum(o) AS r FROM obs GROUP BY event_type),
      |ct AS (SELECT daypart, sum(o) AS c FROM obs GROUP BY daypart),
      |n AS (SELECT sum(o) AS n FROM obs)
      |SELECT round(sum((o - r * c * 1.0 / n) * (o - r * c * 1.0 / n)
      |                 / (r * c * 1.0 / n)), 4) AS chi2,
      |       CAST((count(DISTINCT obs.event_type) - 1)
      |            * (count(DISTINCT obs.daypart) - 1) AS BIGINT) AS dof
      |FROM obs JOIN rt ON obs.event_type = rt.event_type
      |         JOIN ct ON obs.daypart = ct.daypart CROSS JOIN n""".stripMargin
  ) { (s, d) =>
    val daypart = when(hour(col("ts")) < 6, "night")
      .when(hour(col("ts")) < 12, "morning")
      .when(hour(col("ts")) < 18, "afternoon")
      .otherwise("evening")
    val obs = Tables.events(s, d)
      .groupBy(col("event_type"), daypart.as("daypart"))
      .agg(count(lit(1)).as("o"))
    val rt = obs.groupBy(col("event_type").as("rt_type")).agg(sum(col("o")).as("r"))
    val ct = obs.groupBy(col("daypart").as("ct_dp")).agg(sum(col("o")).as("c"))
    val n = obs.agg(sum(col("o")).as("n"))
    val e = col("r") * col("c") * lit(1.0) / col("n")
    obs.join(broadcast(rt), col("event_type") === col("rt_type"))
      .join(broadcast(ct), col("daypart") === col("ct_dp"))
      .crossJoin(broadcast(n))
      .agg(round(sum((col("o") - e) * (col("o") - e) / e), 4).as("chi2"),
        ((countDistinct(col("event_type")) - 1)
          * (countDistinct(col("daypart")) - 1)).as("dof"))
  }

  /** Gini coefficient of per-user purchase revenue (the corpus/revenue
    * concentration audit): G = 2·Σ rkᵢxᵢ / (n·Σx) − (n+1)/n on
    * ascending-sorted x. The rank comes from `Scale.globalRowNumber`
    * bucketed by [[Scale.quantileBuckets]] — data-derived quantile band
    * edges, so #buckets stays ≤64 whatever range per-user revenue spans
    * (a fixed `floor(x/width)` band would quadratically blow up the
    * offsets theta join on heavy-tailed revenue at scale) — and the
    * statistic is one scalar aggregate. The user table is [[Scale.cut]]
    * first: the quantile pass, window, and count table each reference
    * it. Ties rank by user_id in both engines. */
  val qGini: Q = Q(
    "q151_gini_concentration",
    """WITH rev AS (
      |  SELECT user_id, sum(value) AS x FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id),
      |ranked AS (
      |  SELECT x, row_number() OVER (ORDER BY x, user_id) AS rk FROM rev)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |       round(sum(x), 2) AS total_revenue,
      |       round(2.0 * sum(rk * x) / (count(*) * sum(x))
      |             - (count(*) + 1.0) / count(*), 6) AS gini
      |FROM ranked""".stripMargin
  ) { (s, d) =>
    // pinned, not cut: static lineage, three consumers (quantile pass,
    // window, count) — the cache gives the same one-computation
    // guarantee without the eager cut's count + checkpoint-write jobs
    // (optimization r19)
    val rev = Scale.pin(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(sum(col("value")).as("x")))
    val ranked = Scale.globalRowNumber(rev,
      Scale.quantileBuckets(rev, col("x"), 64),
      Seq(col("x"), col("user_id")), "rk")
    ranked.agg(count(lit(1)).as("n_users"),
      round(sum(col("x")), 2).as("total_revenue"),
      round(lit(2.0) * sum(col("rk") * col("x"))
        / (count(lit(1)) * sum(col("x")))
        - (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
  }

  /** Day-of-week seasonal anomaly detection: z-score each day's
    * purchase revenue against its weekday's mean/std (the STL-lite
    * seasonal baseline an ops dashboard runs). Daily aggregate → 7-row
    * weekday stats broadcast back → map-side z-score. Weekday parity:
    * Spark `weekday()` is 0=Monday, DuckDB `isodow()` is 1=Monday —
    * aligned as weekday+1. */
  val qSeasonalAnomaly: Q = Q(
    "q158_seasonal_anomaly",
    """WITH daily AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
      |         isodow(ts) AS dow, round(sum(value), 2) AS rev
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      |sea AS (SELECT dow, avg(rev) AS mu, stddev_samp(rev) AS sd,
      |               CAST(count(*) AS BIGINT) AS n_obs
      |        FROM daily GROUP BY dow)
      |SELECT day, daily.dow AS dow, rev,
      |       round((rev - mu) / nullif(sd, 0), 4) AS z,
      |       abs((rev - mu) / nullif(sd, 0)) > 1.5 AS anomaly
      |FROM daily JOIN sea ON daily.dow = sea.dow
      |ORDER BY day""".stripMargin
  ) { (s, d) =>
    val daily = Tables.events(s, d).filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"),
        (expr("weekday(ts)") + 1).cast("long").as("dow"))
      .agg(round(sum(col("value")), 2).as("rev"))
    val sea = daily.groupBy(col("dow").as("s_dow"))
      .agg(avg(col("rev")).as("mu"), stddev_samp(col("rev")).as("sd"),
        count(lit(1)).as("n_obs"))
    daily.join(broadcast(sea), col("dow") === col("s_dow"))
      .select(col("day"), col("dow"), col("rev"),
        // nullif: a dow group whose daily revenues are all identical has
        // sd = 0.0 (not NULL — that's the n=1 case) and z undefined;
        // ANSI mode turns the raw division into a job error (r15 review)
        round((col("rev") - col("mu")) / nullif(col("sd"), lit(0)), 4).as("z"),
        (abs((col("rev") - col("mu")) / nullif(col("sd"), lit(0))) > 1.5)
          .as("anomaly"))
      .orderBy(col("day"))
  }

  /** cume_dist — the one SQL ranking function the surface didn't yet
    * demonstrate (pandas `rank(pct=True, method='max')` semantics).
    * Partitioned per user, so no global window; ties share a value (both
    * engines define cume_dist as rows ≤ current / rows). */
  val qCumeDist: Q = Q(
    "q159_cume_dist",
    """SELECT user_id, event_id, value,
      |       round(cume_dist() OVER (PARTITION BY user_id ORDER BY value), 6)
      |         AS pct_at_or_below
      |FROM events WHERE user_id < 5
      |ORDER BY user_id, value, event_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("value"))
    Tables.events(s, d).filter(col("user_id") < 5)
      .select(col("user_id"), col("event_id"), col("value"),
        round(cume_dist().over(w), 6).as("pct_at_or_below"))
      .orderBy(col("user_id"), col("value"), col("event_id"))
  }

  /** Skewness/kurtosis per group — computed from raw moments with ONE
    * written-out formula instead of the builtins, because Spark's
    * `skewness` is the population g1 while DuckDB's is the
    * bias-corrected sample form: silently different numbers from the
    * same data. Raw moments come from a single map-side-combined
    * aggregate; the central-moment algebra is identical text in both
    * engines. */
  val qHigherMoments: Q = Q(
    "q160_higher_moments",
    """WITH m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         avg(value) AS m1, avg(value * value) AS p2,
      |         avg(value * value * value) AS p3,
      |         avg(value * value * value * value) AS p4
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  round((p3 - 3 * m1 * p2 + 2 * m1 * m1 * m1)
      |        / nullif(power(p2 - m1 * m1, 1.5), 0), 6) AS skew_g1,
      |  round((p4 - 4 * m1 * p3 + 6 * m1 * m1 * p2 - 3 * m1 * m1 * m1 * m1)
      |        / nullif((p2 - m1 * m1) * (p2 - m1 * m1), 0) - 3, 6)
      |    AS kurt_excess
      |FROM m ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val v = col("value")
    val m = Tables.events(s, d).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), avg(v).as("m1"), avg(v * v).as("p2"),
        avg(v * v * v).as("p3"), avg(v * v * v * v).as("p4"))
    val (m1, p2, p3, p4) = (col("m1"), col("p2"), col("p3"), col("p4"))
    // nullif on the variance powers: a constant-valued (or single-row)
    // group has zero variance and no defined skew/kurtosis — NULL, not
    // an ANSI divide-by-zero job error (r15 review; the driver fixtures
    // never hit it, a rare-event-type group at 100 TB would)
    m.select(col("event_type"), col("n"),
        round((p3 - lit(3) * m1 * p2 + lit(2) * m1 * m1 * m1)
          / nullif(pow(p2 - m1 * m1, 1.5), lit(0)), 6).as("skew_g1"),
        round((p4 - lit(4) * m1 * p3 + lit(6) * m1 * m1 * p2
          - lit(3) * m1 * m1 * m1 * m1)
          / nullif((p2 - m1 * m1) * (p2 - m1 * m1), lit(0)) - lit(3), 6)
          .as("kurt_excess"))
      .orderBy(col("event_type"))
  }

  /** A/B experiment readout: users assigned to arms by the q104
    * deterministic md5 bucket (stable under reruns/appends — the
    * experimentation-platform assignment contract), conversion = any
    * purchase in the measurement window; two-proportion pooled z
    * statistic computed from the 2-row arm table. One user-keyed
    * aggregate + a 2-row pivot — the raw log is scanned once. */
  val qAbTest: Q = Q(
    "q167_ab_test",
    """WITH u AS (
      |  SELECT user_id,
      |    CASE WHEN (ascii(substr(md5('graft-ab-1:' || CAST(user_id AS VARCHAR)), 1, 1)) * 131
      |         + ascii(substr(md5('graft-ab-1:' || CAST(user_id AS VARCHAR)), 2, 1))) % 2 = 0
      |         THEN 'control' ELSE 'treatment' END AS arm,
      |    max(CASE WHEN event_type = 'purchase' AND value >= 180
      |             AND ts >= TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS conv
      |  FROM events GROUP BY user_id, arm),
      |a AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(conv) AS BIGINT) AS x FROM u GROUP BY arm),
      |w AS (SELECT
      |  max(CASE WHEN arm = 'control' THEN n END) AS n_c,
      |  max(CASE WHEN arm = 'control' THEN x END) AS x_c,
      |  max(CASE WHEN arm = 'treatment' THEN n END) AS n_t,
      |  max(CASE WHEN arm = 'treatment' THEN x END) AS x_t FROM a)
      |SELECT n_c, x_c, n_t, x_t,
      |  round(x_c * 1.0 / n_c, 6) AS p_c, round(x_t * 1.0 / n_t, 6) AS p_t,
      |  CASE WHEN (x_c + x_t) = 0 OR (x_c + x_t) = (n_c + n_t) THEN NULL
      |       ELSE round((x_t * 1.0 / n_t - x_c * 1.0 / n_c)
      |         / sqrt(((x_c + x_t) * 1.0 / (n_c + n_t))
      |                * (1 - (x_c + x_t) * 1.0 / (n_c + n_t))
      |                * (1.0 / n_c + 1.0 / n_t)), 4) END AS z
      |FROM w""".stripMargin
  ) { (s, d) =>
    val k = md5(concat(lit("graft-ab-1:"), col("user_id").cast("string")))
    val u = Tables.events(s, d)
      .withColumn("arm",
        when((ascii(substring(k, 1, 1)) * 131 + ascii(substring(k, 2, 1))) % 2
          === 0, "control").otherwise("treatment"))
      .groupBy(col("user_id"), col("arm"))
      .agg(max(when(col("event_type") === "purchase" && col("value") >= 180 &&
        col("ts") >= lit("2024-01-15").cast("timestamp"), 1).otherwise(0))
        .as("conv"))
    val a = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
    val w = a.agg(
      max(when(col("arm") === "control", col("n"))).as("n_c"),
      max(when(col("arm") === "control", col("x"))).as("x_c"),
      max(when(col("arm") === "treatment", col("n"))).as("n_t"),
      max(when(col("arm") === "treatment", col("x"))).as("x_t"))
    val (nc, xc, nt, xt) = (col("n_c"), col("x_c"), col("n_t"), col("x_t"))
    val pPool = (xc + xt) * lit(1.0) / (nc + nt)
    // degenerate corpora (zero or universal conversion) have no defined
    // z — emit NULL instead of dividing by a zero pooled variance. Not
    // reachable on the driver fixtures; the sf1 differential corpus
    // found it (r15), and at 100 TB an experiment readout hitting an
    // empty measurement window must degrade, not kill the job (ANSI
    // mode makes the raw division an ERROR, not an inf)
    w.select(nc, xc, nt, xt,
      round(xc * lit(1.0) / nc, 6).as("p_c"),
      round(xt * lit(1.0) / nt, 6).as("p_t"),
      when(xc + xt === 0 || xc + xt === nc + nt, lit(null))
        .otherwise(round((xt * lit(1.0) / nt - xc * lit(1.0) / nc)
          / sqrt(pPool * (lit(1) - pPool) * (lit(1.0) / nc + lit(1.0) / nt)),
          4)).as("z"))
  }

  /** pandas `df.corrwith(other)`: column-wise correlation between two
    * keyed frames — here each user's first-half vs second-half (n_events,
    * revenue), the period-over-period stability check. Two user-keyed
    * aggregates from conditional counts on ONE scan, an inner join on
    * the key, then corr() per matching column pair. Both engines' corr
    * is sample Pearson (the n/(n−1) factors cancel in the ratio). */
  val qCorrWith: Q = Q(
    "q168_corrwith",
    """WITH j AS (
      |  SELECT user_id,
      |    CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-15') AS BIGINT) AS an,
      |    sum(value) FILTER (WHERE ts < TIMESTAMP '2024-01-15') AS ar,
      |    CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-15') AS BIGINT) AS bn,
      |    sum(value) FILTER (WHERE ts >= TIMESTAMP '2024-01-15') AS br
      |  FROM events GROUP BY user_id
      |  HAVING an > 0 AND bn > 0)
      |SELECT * FROM (
      |  SELECT 'n_events' AS metric, round(corr(an, bn), 6) AS corr_ab FROM j
      |  UNION ALL SELECT 'revenue', round(corr(ar, br), 6) FROM j)
      |ORDER BY metric""".stripMargin
  ) { (s, d) =>
    val cut = lit("2024-01-15").cast("timestamp")
    val j = Tables.events(s, d).groupBy(col("user_id"))
      .agg(count(when(col("ts") < cut, 1)).as("an"),
        sum(when(col("ts") < cut, col("value"))).as("ar"),
        count(when(col("ts") >= cut, 1)).as("bn"),
        sum(when(col("ts") >= cut, col("value"))).as("br"))
      .filter(col("an") > 0 && col("bn") > 0)
    val rn = j.agg(round(corr(col("an"), col("bn")), 6).as("corr_ab"))
      .select(lit("n_events").as("metric"), col("corr_ab"))
    val rr = j.agg(round(corr(col("ar"), col("br")), 6).as("corr_ab"))
      .select(lit("revenue").as("metric"), col("corr_ab"))
    rn.union(rr).orderBy(col("metric"))
  }

  /** ROLLING regression (pandas `rolling(20).apply(slope)` / the online
    * trend detector): per user, the OLS slope of value against event
    * index over the trailing 20 events — q149's regr_* algebra moved
    * into a window frame. x is the per-user row index (small exact
    * integers, so n·Σx² − (Σx)² is exact and the cancellation-prone
    * term is integer arithmetic — epoch-microsecond x would lose the
    * slope to fp cancellation at 1e30 magnitudes). One user-keyed sort
    * feeds all five running sums; partitions are per-user, never
    * global. */
  val qRollingRegression: Q = Q(
    "q173_rolling_regression",
    """WITH e AS (SELECT user_id, event_id, value,
      |             CAST(row_number() OVER (PARTITION BY user_id
      |               ORDER BY ts, event_id) AS BIGINT) AS x
      |           FROM events WHERE user_id < 20),
      |r AS (SELECT user_id, event_id, x, value,
      |        CAST(count(*) OVER w AS BIGINT) AS n,
      |        sum(x) OVER w AS sx, sum(value) OVER w AS sy,
      |        sum(x * value) OVER w AS sxy, sum(x * x) OVER w AS sxx
      |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY x
      |        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
      |SELECT user_id, event_id, x, n,
      |       round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 6)
      |         AS slope
      |FROM r WHERE n >= 5 ORDER BY user_id, x""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wRn = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val e = Tables.events(s, d).filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("value"),
        row_number().over(wRn).cast("long").as("x"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("x"))
      .rowsBetween(-19, Window.currentRow)
    val r = e.select(col("user_id"), col("event_id"), col("x"), col("value"),
      count(lit(1)).over(w).as("n"),
      sum(col("x")).over(w).as("sx"), sum(col("value")).over(w).as("sy"),
      sum(col("x") * col("value")).over(w).as("sxy"),
      sum(col("x") * col("x")).over(w).as("sxx"))
    r.filter(col("n") >= 5)
      .select(col("user_id"), col("event_id"), col("x"), col("n"),
        round((col("n") * col("sxy") - col("sx") * col("sy"))
          / nullif(col("n") * col("sxx") - col("sx") * col("sx"), lit(0)), 6)
          .as("slope"))
      .orderBy(col("user_id"), col("x"))
  }

  /** WINSORIZED MEAN (robust aggregation): per return flag, the mean of
    * extended price after clipping to the [p05, p95] band — the outlier-
    * resistant KPI next to the raw mean. Percentiles come from a groupBy
    * `percentile` aggregate (exact linear interpolation, the same formula
    * as DuckDB's quantile_cont), rounded to 6 dp before clipping so both
    * engines clip at identical bounds. Exact percentile buffers one
    * group's values on a reducer — fine at 3 groups; at 100 TB the
    * one-word swap is `approx_percentile(..., accuracy)` (bounded memory,
    * same plan shape) or the q174 banded exact machinery when exactness
    * is contractual. The clip itself is a broadcast join of the 3-row
    * bounds table back onto the scan — no second wide shuffle. */
  val qWinsorizedMean: Q = Q(
    "q182_winsorized_mean",
    """WITH b AS (SELECT l_returnflag,
      |    round(quantile_cont(l_extendedprice, 0.05), 6) AS lo,
      |    round(quantile_cont(l_extendedprice, 0.95), 6) AS hi
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |  round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
      |    AS winsorized_mean,
      |  round(avg(l.l_extendedprice), 4) AS raw_mean,
      |  CAST(sum(CASE WHEN l.l_extendedprice < b.lo
      |                  OR l.l_extendedprice > b.hi
      |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
      |FROM lineitem l JOIN b USING (l_returnflag)
      |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(round(percentile(col("l_extendedprice"), lit(0.05)), 6).as("lo"),
        round(percentile(col("l_extendedprice"), lit(0.95)), 6).as("hi"))
    li.join(broadcast(bounds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(avg(least(greatest(col("l_extendedprice"), col("lo")),
          col("hi"))), 4).as("winsorized_mean"),
        round(avg(col("l_extendedprice")), 4).as("raw_mean"),
        sum(when(col("l_extendedprice") < col("lo")
          || col("l_extendedprice") > col("hi"), 1L).otherwise(0L))
          .as("n_clipped"))
      .orderBy(col("l_returnflag"))
  }

  /** BENFORD FIRST-DIGIT AUDIT — the classic fabricated-numbers smell
    * test: the distribution of leading digits of order totals against
    * Benford's law p(d) = log10(1 + 1/d). One scan, one 9-row hash
    * aggregate, a 1-row broadcast total; deviations computed from the
    * UNROUNDED ratio then rounded identically in both engines. `floor`
    * (not CAST) extracts the integer part — DuckDB's double→int CAST
    * rounds half-to-even while Spark's truncates, so the digit string
    * must come from an explicitly floored value. */
  val qBenford: Q = Q(
    "q183_benford_first_digit",
    """WITH t AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS v
      |           FROM orders WHERE o_totalprice >= 1),
      |c AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |        CAST(count(*) AS BIGINT) AS n
      |      FROM t GROUP BY digit),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM c)
      |SELECT digit, n, round(n * 1.0 / tn, 6) AS observed_p,
      |  round(log10(1 + 1.0 / digit), 6) AS benford_p,
      |  round(abs(n * 1.0 / tn - log10(1 + 1.0 / digit)), 6) AS abs_dev
      |FROM c, tot ORDER BY digit""".stripMargin
  ) { (s, d) =>
    val c = Tables.orders(s, d).filter(col("o_totalprice") >= 1)
      .select(floor(col("o_totalprice")).as("v"))
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = c.agg(sum(col("n")).as("tn"))
    c.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n") * lit(1.0) / col("tn"), 6).as("observed_p"),
        round(log10(lit(1) + lit(1.0) / col("digit")), 6).as("benford_p"),
        round(abs(col("n") * lit(1.0) / col("tn")
          - log10(lit(1) + lit(1.0) / col("digit"))), 6).as("abs_dev"))
      .orderBy(col("digit"))
  }

  /** KEY-SKEW PROFILE (the shuffle-planning diagnostic run BEFORE
    * choosing a join/agg strategy at scale): per-key row counts for a
    * prospective shuffle key, the 10 hottest keys with their share of
    * the table, and each key's heat relative to the mean key (the
    * "how many reducers does my hottest key need" number that decides
    * between a plain shuffle, AQE skew split, and salting). One hash
    * aggregate builds the key table; totals ride a broadcast 1-row
    * cross join; the top-10 is TakeOrderedAndProject, so nothing
    * key-cardinality-sized is ever sorted globally. */
  val qKeySkewProfile: Q = Q(
    "q186_key_skew_profile",
    """WITH k AS (SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS n
      |           FROM lineitem GROUP BY 1),
      |t AS (SELECT sum(n) AS tot, count(*) AS n_keys FROM k)
      |SELECT key, n,
      |       round(n * 1.0 / tot, 6) AS share,
      |       round(n * n_keys * 1.0 / tot, 2) AS x_mean_key
      |FROM k, t ORDER BY n DESC, key LIMIT 10""".stripMargin
  ) { (s, d) =>
    val k = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("key")).agg(count(lit(1)).as("n"))
    val t = k.agg(sum(col("n")).as("tot"), count(lit(1)).as("n_keys"))
    k.crossJoin(broadcast(t))
      .select(col("key"), col("n"),
        round(col("n") * lit(1.0) / col("tot"), 6).as("share"),
        round(col("n") * col("n_keys") * lit(1.0) / col("tot"), 2).as("x_mean_key"))
      .orderBy(desc("n"), col("key")).limit(10)
  }

  /** PER-HOUR EXACT PERCENTILE BANDS (the ops-dashboard p50/p95/p99
    * latency table): one hash aggregate per hour-of-day bucket with
    * Spark's exact interpolating `percentile` — same continuous
    * definition as DuckDB's quantile_cont, so the hash compare pins the
    * interpolation arithmetic, not just the bucketing. 24 output rows;
    * the aggregate is two-phase (map-side partials collect per-bucket
    * value lists only at reduce — at 100 TB swap in percentile_approx,
    * the q82-tested sketch, when exactness can yield). */
  val qPercentileBands: Q = Q(
    "q187_hourly_percentile_bands",
    """SELECT hour(ts) AS hr, CAST(count(*) AS BIGINT) AS n,
      |       round(quantile_cont(value, 0.5), 6) AS p50,
      |       round(quantile_cont(value, 0.95), 6) AS p95,
      |       round(quantile_cont(value, 0.99), 6) AS p99
      |FROM events GROUP BY 1 ORDER BY hr""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d)
      .groupBy(hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5D)"), 6).as("p50"),
        round(expr("percentile(value, 0.95D)"), 6).as("p95"),
        round(expr("percentile(value, 0.99D)"), 6).as("p99"))
      .orderBy(col("hr"))
  }

  /** PSI FEATURE-DRIFT MONITOR (round 11 — population stability index,
    * the standard production ML drift metric; the numeric-feature
    * sibling of t95's token-distribution KL drift): `value` binned by
    * the EXPECTED slice's own deciles (events before the boundary
    * TIMESTAMP literal — monotone in event time, so the baseline stays
    * a contiguous period on any multi-month corpus; a dayofmonth split
    * would interleave time periods and corrupt the drift semantics,
    * the exact hazard q199's r11 review fix removed), the ACTUAL slice
    * (at-or-after the boundary) scored against them — psi = Σ (aᵢ − eᵢ)·ln(aᵢ/eᵢ)
    * with +0.5/+5 Laplace smoothing so an empty bin stays finite.
    * Industry reading: psi < 0.1 stable, > 0.2 drifted (the emitted
    * flag).
    *
    * Cross-engine discipline (this round's v74 lesson applied forward):
    * per-bin terms are bit-identical on both engines (integer counts →
    * identical double arithmetic, no summation), but the TOTAL sums 10
    * doubles whose order the engines need not share — so each rounded
    * term is cast to DECIMAL(18,6) first and summed exactly
    * (order-independent), then surfaced as DOUBLE. Decile edges use the
    * exact interpolating percentile whose quantile_cont parity q187
    * pins; percentile_approx is the documented 100 TB swap. Scale
    * shape: two slice scans + two 10-group hash aggregates; everything
    * downstream is 10-row arithmetic on broadcast frames. */
  val qPsiDrift: Q = Q(
    "q200_psi_drift",
    """WITH ex AS (SELECT value FROM events WHERE ts < TIMESTAMP '2024-01-15'),
      |act AS (SELECT value FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
      |ed AS (SELECT quantile_cont(value,
      |         [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS ed FROM ex),
      |eb AS (SELECT 1 + CAST(value > ed[1] AS INT) + CAST(value > ed[2] AS INT)
      |         + CAST(value > ed[3] AS INT) + CAST(value > ed[4] AS INT)
      |         + CAST(value > ed[5] AS INT) + CAST(value > ed[6] AS INT)
      |         + CAST(value > ed[7] AS INT) + CAST(value > ed[8] AS INT)
      |         + CAST(value > ed[9] AS INT) AS bin FROM ex, ed),
      |ab AS (SELECT 1 + CAST(value > ed[1] AS INT) + CAST(value > ed[2] AS INT)
      |         + CAST(value > ed[3] AS INT) + CAST(value > ed[4] AS INT)
      |         + CAST(value > ed[5] AS INT) + CAST(value > ed[6] AS INT)
      |         + CAST(value > ed[7] AS INT) + CAST(value > ed[8] AS INT)
      |         + CAST(value > ed[9] AS INT) AS bin FROM act, ed),
      |ec AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_exp FROM eb GROUP BY bin),
      |ac AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_act FROM ab GROUP BY bin),
      |tot AS (SELECT (SELECT count(*) FROM ex) AS tot_e,
      |               (SELECT count(*) FROM act) AS tot_a),
      |grid AS (SELECT CAST(r.range AS BIGINT) AS bin FROM range(1, 11) r),
      |terms AS (
      |  SELECT g.bin, coalesce(ec.n_exp, 0) AS n_exp,
      |         coalesce(ac.n_act, 0) AS n_act,
      |         (CAST(coalesce(ec.n_exp, 0) AS DOUBLE) + 0.5)
      |           / (CAST(tot.tot_e AS DOUBLE) + 5.0) AS es,
      |         (CAST(coalesce(ac.n_act, 0) AS DOUBLE) + 0.5)
      |           / (CAST(tot.tot_a AS DOUBLE) + 5.0) AS asx
      |  FROM grid g LEFT JOIN ec ON g.bin = ec.bin
      |       LEFT JOIN ac ON g.bin = ac.bin CROSS JOIN tot),
      |t2 AS (SELECT bin, n_exp, n_act, round(es, 6) AS exp_share,
      |         round(asx, 6) AS act_share,
      |         round((asx - es) * ln(asx / es), 6) AS psi_term
      |       FROM terms),
      |ttl AS (SELECT CAST(sum(CAST(psi_term AS DECIMAL(18, 6))) AS DOUBLE)
      |          AS psi FROM t2)
      |SELECT bin, n_exp, n_act, exp_share, act_share, psi_term,
      |       ttl.psi, ttl.psi > 0.2 AS drifted
      |FROM t2 CROSS JOIN ttl ORDER BY bin""".stripMargin
  ) { (s, d) =>
    val b = lit("2024-01-15 00:00:00").cast("timestamp")
    val ev = Tables.events(s, d).select(col("value"), col("ts"))
    val ex = ev.filter(col("ts") < b).select(col("value"))
    val act = ev.filter(col("ts") >= b).select(col("value"))
    val edges = ex.agg(expr(
      "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
      .as("ed"))
    def binned(df: org.apache.spark.sql.DataFrame) =
      df.crossJoin(broadcast(edges))
        .select((lit(1) + (1 to 9).map(i =>
          (col("value") > element_at(col("ed"), i)).cast("int"))
          .reduce(_ + _)).cast("long").as("bin"))
    val ec = binned(ex).groupBy(col("bin")).agg(count(lit(1)).as("n_exp"))
    val ac = binned(act).groupBy(col("bin")).agg(count(lit(1)).as("n_act"))
    val tot = ex.agg(count(lit(1)).as("tot_e"))
      .crossJoin(act.agg(count(lit(1)).as("tot_a")))
    val grid = s.range(1, 11).select(col("id").as("bin"))
    val es = (coalesce(col("n_exp"), lit(0L)).cast("double") + 0.5) /
      (col("tot_e").cast("double") + 5.0)
    val asx = (coalesce(col("n_act"), lit(0L)).cast("double") + 0.5) /
      (col("tot_a").cast("double") + 5.0)
    val terms = grid.join(ec, Seq("bin"), "left").join(ac, Seq("bin"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        coalesce(col("n_exp"), lit(0L)).as("n_exp"),
        coalesce(col("n_act"), lit(0L)).as("n_act"),
        round(es, 6).as("exp_share"), round(asx, 6).as("act_share"),
        round((asx - es) * log(asx / es), 6).as("psi_term"))
    val ttl = terms.agg(
      sum(col("psi_term").cast("decimal(18,6)")).cast("double").as("psi"))
    terms.crossJoin(broadcast(ttl))
      .select(col("bin"), col("n_exp"), col("n_act"), col("exp_share"),
        col("act_share"), col("psi_term"), col("psi"),
        (col("psi") > 0.2).as("drifted"))
      .orderBy(col("bin"))
  }

  val all: Seq[Q] = Seq(qOls, qChi2, qGini, qSeasonalAnomaly, qCumeDist,
    qHigherMoments, qAbTest, qCorrWith, qRollingRegression,
    qWinsorizedMean, qBenford, qKeySkewProfile, qPercentileBands, qPsiDrift)
}
