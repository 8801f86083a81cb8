package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Window / ordered-frame surface (SURVEY.md §2.2 "Window"): dask
  * rolling / cumsum / shift / rank → Spark window functions.
  *
  * Every ORDER BY inside a window carries a unique tie-break key so the
  * result is deterministic (oracle parity note, FIXTURES.md). Partition
  * keys (custkey, user_id) are the natural distribution keys at 100 TB —
  * one shuffle, then per-partition sorted evaluation.
  *
  * Reference capability: dask rolling/cumsum/shift via the deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object Windows {

  /** Top-3 orders per customer by totalprice (pandas groupby.head-after-
    * sort / rank idiom). */
  val qTopkPerGroup: Q = Q(
    "q21_window_topk_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** rank / dense_rank / ntile over a GLOBAL ordering — the scale-unsafe
    * form (`Window.orderBy` with no partition) moves the whole table to
    * one task, so this is built from Scale's bucket-offset machinery
    * instead: band acctbal into ~22 range buckets (monotone in the sort
    * order), rank within buckets in parallel, offset by earlier-bucket
    * counts; dense_rank over the banded key via the distinct-key theta
    * join; ntile(4) as arithmetic over the global row number. No
    * single-partition WindowExec in the plan (PlanSpec asserts this).
    * (acctbal DESC, suppkey) is a total order, so rank == row_number. */
  val qRanks: Q = Q(
    "q22_window_ranks",
    """SELECT s_suppkey, s_acctbal,
      |       rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rnk,
      |       dense_rank() OVER (ORDER BY round(s_acctbal / 1000, 0)) AS drnk,
      |       ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS quartile
      |FROM supplier ORDER BY s_suppkey""".stripMargin
  ) { (s, d) =>
    val base = Tables.supplier(s, d)
    // bucket ascending == acctbal descending (banding of the primary key;
    // TPC-H acctbal spans [-999.99, 9999.99] → ~22 buckets of width 500)
    val ranked = Scale.globalRowNumber(base,
      floor(-col("s_acctbal") / 500),
      Seq(desc("s_acctbal"), col("s_suppkey")), "rnk")
    val dense = Scale.globalDenseRank(ranked,
      round(col("s_acctbal") / 1000, 0), "drnk")
    val total = base.agg(count(lit(1)).as("_n"))
    dense.join(broadcast(total), lit(true))
      .withColumn("quartile", Scale.ntileFromRowNumber(col("rnk"), col("_n"), 4))
      .select("s_suppkey", "s_acctbal", "rnk", "drnk", "quartile")
      .orderBy(col("s_suppkey"))
  }

  /** Cumulative sum per customer over order date (dask `cumsum`). Summation
    * order is pinned by the frame, so values match the oracle exactly. */
  val qCumsum: Q = Q(
    "q23_window_cumsum",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |     ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      |FROM orders
      |WHERE o_custkey <= 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 100)
      .withColumn("running_total", round(sum(col("o_totalprice")).over(w), 2))
      .select("o_custkey", "o_orderkey", "running_total")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lag / lead / diff (dask `shift` / `diff`): inter-event gap per user in
    * microseconds (integer — exact parity, no float noise). */
  val qLagLead: Q = Q(
    "q24_window_lag_diff",
    """SELECT user_id, event_id,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
      |  lead(event_id) OVER w AS next_event
      |FROM events
      |WHERE user_id <= 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("user_id") <= 20)
      .withColumn("gap_us",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("next_event", lead(col("event_id"), 1).over(w))
      .select("user_id", "event_id", "gap_us", "next_event")
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Time-range rolling frame (dask `rolling('1h', on=ts)` via
    * map_overlap): 1-hour trailing mean per user. RANGE frame over epoch
    * seconds — identical inclusive-boundary semantics both engines. */
  val qRollingTime: Q = Q(
    "q25_window_rolling_1h",
    """SELECT user_id, event_id,
      |  round(sum(value) OVER (PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2)
      |  / count(*) OVER (PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS avg_1h,
      |  count(*) OVER (PARTITION BY user_id
      |    ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h
      |FROM events WHERE user_id <= 20
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600, Window.currentRow)
    Tables.events(s, d)
      .filter(col("user_id") <= 20)
      .withColumn("avg_1h",
        round(sum(col("value")).over(w), 2) / count(lit(1)).over(w))
      .withColumn("n_1h", count(lit(1)).over(w))
      .select("user_id", "event_id", "avg_1h", "n_1h")
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Row-count sliding frame (dask `rolling(n)`): trailing-5 moving sum. */
  val qRollingRows: Q = Q(
    "q26_window_rolling_5rows",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2) AS sum5,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 2)
      |  / count(*) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS avg5
      |FROM orders WHERE o_custkey <= 100
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-4, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 100)
      .withColumn("sum5", round(sum(col("o_totalprice")).over(w), 2))
      .withColumn("avg5",
        round(sum(col("o_totalprice")).over(w), 2) / count(lit(1)).over(w))
      .select("o_custkey", "o_orderkey", "sum5", "avg5")
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** The rest of the cumulative family (dask `cummax`/`cummin`/`cumprod`;
    * cumsum is q23). Spark has no product aggregate, so cumprod is built
    * from exp(sum(ln|x|)) with explicit sign/zero handling over the same
    * frame: zero-if-any-zero-so-far, sign from the running count of
    * negative factors. Factors are small exact integers (linenumber - 3,
    * exercising negatives AND zeros) so the exp/ln round-trip stays well
    * inside the 6-decimal rounding; oracle uses DuckDB's native
    * `product()` window, proving the identity, not mirroring it. The
    * `+ 0.0` normalizes DuckDB's IEEE signed zero: `product` emits -0.0
    * when a zero factor follows an odd number of negatives, while the
    * zero-if-any-zero branch here emits +0.0 — bit-equal everywhere else
    * (r2 driver hash compared bits, not values). */
  val qCumMinMaxProd: Q = Q(
    "q87_window_cummax_cumprod",
    """SELECT l_orderkey, l_linenumber,
      |  max(l_quantity) OVER w AS cum_max_qty,
      |  min(l_quantity) OVER w AS cum_min_qty,
      |  round(product(CAST(l_linenumber - 3 AS DOUBLE)) OVER w, 6) + 0.0 AS cum_prod
      |FROM lineitem WHERE l_orderkey < 1000
      |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = (col("l_linenumber") - 3).cast("double")
    val anyZero = max(when(x === 0, 1).otherwise(0)).over(w)
    val negParity = pmod(sum(when(x < 0, 1L).otherwise(0L)).over(w), lit(2L))
    val magnitude = exp(sum(log(abs(x))).over(w)) // log(0) → null, skipped; anyZero covers it
    Tables.lineitem(s, d).filter(col("l_orderkey") < 1000)
      .select(col("l_orderkey"), col("l_linenumber"),
        max(col("l_quantity")).over(w).as("cum_max_qty"),
        min(col("l_quantity")).over(w).as("cum_min_qty"),
        round(when(anyZero === 1, 0.0)
          .otherwise((lit(1.0) - lit(2.0) * negParity) * magnitude), 6).as("cum_prod"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Forward/backward fill (dask `ffill`/`bfill`): carry the last/next
    * non-null observation within each user's ordered event stream. Nulls
    * are injected deterministically (event_id % 7 < 2) so both engines
    * fill the identical gaps. One ordered window per direction — the
    * per-partition frame shape map_overlap handles in dask; no
    * single-partition window anywhere. */
  val qFill: Q = Q(
    "q92_ffill_bfill",
    """SELECT user_id, event_id,
      |  round(coalesce(last_value(v IGNORE NULLS) OVER wf, -1.0), 4) AS ffilled,
      |  round(coalesce(first_value(v IGNORE NULLS) OVER wb, -1.0), 4) AS bfilled
      |FROM (SELECT user_id, event_id, ts,
      |        CASE WHEN event_id % 7 < 2 THEN NULL ELSE value END AS v
      |      FROM events WHERE user_id <= 20)
      |WINDOW
      |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wb AS (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val wf = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(s, d).filter(col("user_id") <= 20)
      .withColumn("v", when(col("event_id") % 7 < 2, lit(null)).otherwise(col("value")))
      .select(col("user_id"), col("event_id"),
        round(coalesce(last(col("v"), ignoreNulls = true).over(wf), lit(-1.0)), 4)
          .as("ffilled"),
        round(coalesce(first(col("v"), ignoreNulls = true).over(wb), lit(-1.0)), 4)
          .as("bfilled"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Rolling quantiles (dask `rolling(n).median()/quantile(q)`): exact
    * interpolated percentile over a 5-row trailing frame per customer —
    * `percentile` as a WINDOW aggregate (Spark buffers only the frame,
    * not the partition) against DuckDB's `quantile_cont OVER`. Same
    * interpolation parity contract as q17. */
  val qRollingMedian: Q = Q(
    "q107_rolling_median",
    """SELECT o_custkey, o_orderkey,
      |  round(quantile_cont(o_totalprice, 0.5) OVER w, 4) AS med5,
      |  round(quantile_cont(o_totalprice, 0.75) OVER w, 4) AS p75_5
      |FROM orders WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-4, Window.currentRow)
    Tables.orders(s, d).filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percentile(col("o_totalprice"), lit(0.5)).over(w), 4).as("med5"),
        round(percentile(col("o_totalprice"), lit(0.75)).over(w), 4).as("p75_5"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** pandas `Series.autocorr(lag=1)` per key: lag-1 autocorrelation of
    * each event type's hourly totals — resample + shift + corr composed
    * into one plan. Hourly totals round to 2 decimals BEFORE the corr so
    * both engines correlate identical doubles (float-sum order in the
    * hourly sum must not leak into the statistic). */
  val qAutocorr: Q = Q(
    "q117_autocorr_hourly",
    """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
      |             round(sum(value), 2) AS tot
      |           FROM events GROUP BY event_type, hr),
      |l AS (SELECT event_type, tot,
      |        lag(tot) OVER (PARTITION BY event_type ORDER BY hr) AS prev
      |      FROM h)
      |SELECT event_type, CAST(count(prev) AS BIGINT) AS n_pairs,
      |       round(corr(tot, prev), 6) AS autocorr
      |FROM l GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val h = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(round(sum(col("value")), 2).as("tot"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    h.withColumn("prev", lag(col("tot"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(col("prev")).as("n_pairs"),
        round(corr(col("tot"), col("prev")), 6).as("autocorr"))
      .orderBy(col("event_type"))
  }

  /** Linear interpolation of missing values (pandas `interpolate
    * (method='linear')`, dask via map_overlap): per-user event series
    * with synthetic dropout (every event_id ≡ 1,2 mod 5 nulled), each
    * gap filled by the line between its non-null neighbors; leading /
    * trailing gaps fall back to bfill / ffill. Four ignoreNulls window
    * functions over the SAME per-user frame — one shuffle, no self-join.
    * Windows are per-user (bounded partitions), never global. */
  val qInterpolate: Q = Q(
    "q118_interpolate",
    """WITH e AS (SELECT user_id, event_id, ts,
      |             CASE WHEN event_id % 5 IN (1, 2) THEN NULL
      |                  ELSE value END AS v
      |           FROM events WHERE user_id < 10),
      |r AS (SELECT user_id, event_id, v,
      |        CAST(row_number() OVER (PARTITION BY user_id
      |          ORDER BY ts, event_id) AS BIGINT) AS rn
      |      FROM e),
      |n AS (SELECT user_id, event_id, v, rn,
      |        last_value(v IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY rn
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |        last_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY rn
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pr,
      |        first_value(v IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY rn
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |        first_value(CASE WHEN v IS NOT NULL THEN rn END IGNORE NULLS) OVER
      |          (PARTITION BY user_id ORDER BY rn
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nr
      |      FROM r)
      |SELECT user_id, event_id, rn, (v IS NULL) AS was_null,
      |       round(CASE WHEN v IS NOT NULL THEN v
      |                  WHEN pv IS NULL THEN nv
      |                  WHEN nv IS NULL THEN pv
      |                  ELSE pv + (nv - pv) * (rn - pr) / (nr - pr)
      |             END, 6) AS v_interp
      |FROM n ORDER BY user_id, rn""".stripMargin
  ) { (s, d) =>
    val e = Tables.events(s, d).filter(col("user_id") < 10)
      .withColumn("v", when(col("event_id") % 5 isin (1, 2), lit(null))
        .otherwise(col("value")))
    val wo = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val r = e.withColumn("rn", row_number().over(wo).cast("long"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val notNullRn = when(col("v").isNotNull, col("rn"))
    r.withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("pr", last(notNullRn, ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("nr", first(notNullRn, ignoreNulls = true).over(wNext))
      .select(col("user_id"), col("event_id"), col("rn"),
        col("v").isNull.as("was_null"),
        round(when(col("v").isNotNull, col("v"))
          .when(col("pv").isNull, col("nv"))
          .when(col("nv").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv"))
            * (col("rn") - col("pr")) / (col("nr") - col("pr"))), 6)
          .as("v_interp"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** `pct_change` (pandas/dask Series.pct_change): fractional change of
    * each customer's order total vs their previous order. One lag over
    * the per-customer frame; first order per customer yields NULL — kept
    * (pandas keeps the leading NaN). */
  val qPctChange: Q = Q(
    "q120_pct_change",
    """SELECT o_custkey, o_orderkey,
      |       round((o_totalprice - prev) / prev, 6) AS pct_change
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        lag(o_totalprice) OVER (PARTITION BY o_custkey
      |          ORDER BY o_orderdate, o_orderkey) AS prev
      |      FROM orders WHERE o_custkey < 100) t
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d).filter(col("o_custkey") < 100)
      .withColumn("prev", lag(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        round((col("o_totalprice") - col("prev")) / col("prev"), 6)
          .as("pct_change"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** `groupby.cumcount()` / `groupby.ngroup()` (pandas/dask): position of
    * each row within its group (0-based) plus a dense group id. cumcount
    * rides the one per-customer window shuffle; ngroup is a GLOBAL
    * dense_rank, which pandas evaluates serially — here it goes through
    * `Scale.globalDenseRank` (distinct-key theta join, broadcast back),
    * so the fat table is never re-shuffled and no single-partition
    * WindowExec appears (PlanSpec global audit). */
  val qCumcount: Q = Q(
    "q123_group_cumcount",
    """SELECT o_custkey, o_orderkey,
      |       CAST(row_number() OVER (PARTITION BY o_custkey
      |         ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS cumcount,
      |       CAST(dense_rank() OVER (ORDER BY o_custkey) - 1 AS BIGINT) AS ngroup
      |FROM orders WHERE o_custkey < 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_custkey") < 50)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Scale.globalDenseRank(o, col("o_custkey"), "ngroup1")
      .withColumn("cumcount", (row_number().over(w) - 1).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"), col("cumcount"),
        (col("ngroup1") - 1L).cast("long").as("ngroup"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** `expanding()` aggregates (pandas/dask `df.expanding().mean()/max()`):
    * running mean/max/count over each customer's order history — the
    * UNBOUNDED PRECEDING..CURRENT ROW frame. Same shuffle as cumsum
    * (q23); the frame is evaluated in one sorted pass per key. */
  val qExpanding: Q = Q(
    "q124_expanding_agg",
    """SELECT o_custkey, o_orderkey,
      |       round(avg(o_totalprice) OVER w, 6) AS exp_mean,
      |       max(o_totalprice) OVER w AS exp_max,
      |       CAST(count(*) OVER w AS BIGINT) AS exp_n
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d).filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        round(avg(col("o_totalprice")).over(w), 6).as("exp_mean"),
        max(col("o_totalprice")).over(w).as("exp_max"),
        count(lit(1)).over(w).cast("long").as("exp_n"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** pandas `merge_ordered(fill_method='ffill')`: two per-day aggregate
    * series (order counts, event counts) full-outer-joined on the date
    * spine, then each side forward-filled through the other's gap days.
    * The ffill window is global BY CONSTRUCTION on a bounded frame: both
    * inputs are per-day aggregates, so the row count is O(calendar days)
    * — thousands — regardless of corpus size (the aggregation is the
    * bound, like q8's 25-row nation cross; whitelisted in the PlanSpec
    * audit with that argument). */
  val qMergeOrdered: Q = Q(
    "q125_merge_ordered",
    """WITH od AS (SELECT o_orderdate AS d, CAST(count(*) AS BIGINT) AS n_orders
      |           FROM orders GROUP BY 1),
      |ed AS (SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n_events
      |       FROM events GROUP BY 1),
      |m AS (SELECT coalesce(od.d, ed.d) AS d, n_orders, n_events
      |      FROM od FULL OUTER JOIN ed ON od.d = ed.d)
      |SELECT d,
      |  coalesce(n_orders,
      |    last_value(n_orders IGNORE NULLS) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_orders_f,
      |  coalesce(n_events,
      |    last_value(n_events IGNORE NULLS) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_events_f
      |FROM m ORDER BY d""".stripMargin
  ) { (s, d) =>
    val od = Tables.orders(s, d).groupBy(col("o_orderdate").as("d"))
      .agg(count(lit(1)).as("n_orders"))
    val ed = Tables.events(s, d).groupBy(col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("n_events"))
    val m = od.join(ed, Seq("d"), "full_outer")
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, -1)
    m.select(col("d"),
        coalesce(col("n_orders"),
          last(col("n_orders"), ignoreNulls = true).over(w), lit(0L))
          .as("n_orders_f"),
        coalesce(col("n_events"),
          last(col("n_events"), ignoreNulls = true).over(w), lit(0L))
          .as("n_events_f"))
      .orderBy(col("d"))
  }

  /** `groupby.rank(pct=True)` (pandas/dask): per-customer percentile
    * position of each order by totalprice. With the unique
    * (totalprice, orderkey) tie-break, pandas' pct rank IS cume_dist;
    * SQL percent_rank reported alongside. Same one-shuffle frame as
    * every per-customer window. */
  val qGroupPctRank: Q = Q(
    "q126_group_pct_rank",
    """SELECT o_custkey, o_orderkey,
      |       round(percent_rank() OVER w, 6) AS pct_rank,
      |       round(cume_dist() OVER w, 6) AS cume,
      |       CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
      |FROM orders WHERE o_custkey < 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wAll = Window.partitionBy(col("o_custkey"))
    Tables.orders(s, d).filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        count(lit(1)).over(wAll).cast("long").as("n_orders"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** pandas `rolling(10).corr(other)`: rolling correlation of a series
    * with its own lag (the streaming autocorrelation monitor, cousin of
    * q117's bucketed autocorr). Two chained window passes over ONE
    * per-user sorted frame — the lag pass and the corr-frame pass share
    * the (user_id, ts) partitioning/ordering, so Spark plans a single
    * sort with two WindowExecs on top, no re-shuffle. `corr` runs as a
    * window aggregate (any declarative aggregate does); rows before the
    * window fills (rn < 10) are cut, matching pandas min_periods. */
  val qRollingCorr: Q = Q(
    "q133_rolling_corr",
    """WITH l AS (SELECT user_id, ts, value,
      |    lag(value) OVER (PARTITION BY user_id ORDER BY ts) AS lagv,
      |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS rn
      |  FROM events)
      |SELECT user_id, rn,
      |  round(corr(value, lagv) OVER (PARTITION BY user_id ORDER BY ts
      |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS roll_corr
      |FROM l WHERE user_id < 5
      |QUALIFY rn >= 10
      |ORDER BY user_id, rn""".stripMargin
  ) { (s, d) =>
    val wl = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val wr = wl.rowsBetween(-9, 0)
    Tables.events(s, d)
      .filter(col("user_id") < 5)
      .withColumn("lagv", lag(col("value"), 1).over(wl))
      .withColumn("rn", row_number().over(wl).cast("long"))
      .withColumn("roll_corr", round(corr(col("value"), col("lagv")).over(wr), 6))
      .filter(col("rn") >= 10)
      .select(col("user_id"), col("rn"), col("roll_corr"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** pandas `rank(method='average')` — the one ranking method Spark has
    * no builtin for (rank = 'min', dense_rank = 'dense', row_number =
    * 'first'): tied values share the MEAN of their positions. Identity:
    * avg_rank = rank() + (tie_count − 1)/2, so it composes from two
    * window aggregates over the SAME (key, order) partitioning — one
    * sort, two WindowExecs, no re-shuffle. Ties are manufactured by
    * banding prices to thousands (real totals are near-unique). */
  val qRankAverage: Q = Q(
    "q140_rank_average",
    """SELECT o_custkey, o_orderkey, band,
      |       round(r + (c - 1) / 2.0, 1) AS avg_rank
      |FROM (SELECT o_custkey, o_orderkey,
      |        CAST(floor(o_totalprice / 10000) AS BIGINT) AS band,
      |        CAST(rank() OVER (PARTITION BY o_custkey
      |          ORDER BY floor(o_totalprice / 10000)) AS BIGINT) AS r,
      |        CAST(count(*) OVER (PARTITION BY o_custkey,
      |          floor(o_totalprice / 10000)) AS BIGINT) AS c
      |      FROM orders WHERE o_custkey < 50) t
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val band = floor(col("o_totalprice") / 10000).cast("long")
    val wR = Window.partitionBy(col("o_custkey")).orderBy(band)
    val wC = Window.partitionBy(col("o_custkey"), band)
    Tables.orders(s, d).filter(col("o_custkey") < 50)
      .select(col("o_custkey"), col("o_orderkey"), band.as("band"),
        rank().over(wR).cast("long").as("r"),
        count(lit(1)).over(wC).cast("long").as("c"))
      .select(col("o_custkey"), col("o_orderkey"), col("band"),
        round(col("r") + (col("c") - 1) / 2.0, 1).as("avg_rank"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** PARETO FRONTIER (2-D skyline: minimize price, maximize size) — the
    * "best tradeoff set" query. A point survives iff no other point is
    * strictly cheaper AND strictly bigger, i.e. iff its size ≥ the max
    * size over all strictly-smaller prices. The naive form is the
    * oracle's O(n²) NOT EXISTS; the Spark plan decomposes it: dominance
    * depends only on the per-distinct-price max size (one groupBy),
    * then that prefix-max is computed BANDED — a per-band window plus a
    * #bands² theta join on the tiny per-band aggregate for the carry-in
    * (the `globalRowNumber` pattern) — so no unpartitioned window ever
    * sees the corpus. At 100 TB the bands come from price quantiles;
    * here fixed-width bins keep both engines deterministic. */
  val qParetoFrontier: Q = Q(
    "q177_pareto_frontier",
    """SELECT t.p_partkey, t.p_retailprice, t.p_size
      |FROM part t
      |WHERE NOT EXISTS (SELECT 1 FROM part o
      |  WHERE o.p_retailprice < t.p_retailprice AND o.p_size > t.p_size)
      |ORDER BY t.p_retailprice, t.p_partkey""".stripMargin
  ) { (s, d) =>
    val part = Tables.part(s, d)
    val pm = part.groupBy(col("p_retailprice")).agg(max(col("p_size")).as("msz"))
      .withColumn("band", floor(col("p_retailprice") / 100).cast("long"))
    // one row per distinct price → rowsBetween(-1) = strictly smaller
    // prices within the band
    val wLoc = Window.partitionBy(col("band")).orderBy(col("p_retailprice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = pm.withColumn("loc", max(col("msz")).over(wLoc))
    val bAgg = pm.groupBy(col("band")).agg(max(col("msz")).as("bm"))
    val carry = bAgg.select(col("band").as("a_band"))
      .join(bAgg.select(col("band").as("b_band"), col("bm")),
        col("b_band") < col("a_band"))
      .groupBy(col("a_band")).agg(max(col("bm")).as("carry"))
      .withColumnRenamed("a_band", "band")
    val dom = local.join(broadcast(carry), Seq("band"), "left")
      .select(col("p_retailprice"),
        greatest(coalesce(col("loc"), lit(-1)), coalesce(col("carry"), lit(-1)))
          .as("dom"))
    part.join(dom, Seq("p_retailprice"))
      .filter(col("p_size") >= col("dom"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
  }

  /** SEQUENCE GAP FINDER (gaps-and-islands "what ids are missing"): the
    * data-quality sweep over an id sequence with holes — here the
    * purchase-event ids, a genuinely gapped subsequence. The oracle is
    * one global lag window; the Spark plan never orders the corpus
    * globally: ids band by floor(id/1024), intra-band gaps come from a
    * per-band lag, and the ≤1 gap spanning each band boundary comes
    * from the tiny per-band (min, max) aggregate stitched via a
    * next-non-empty-band theta join (bands with no surviving ids make
    * neighbor bands non-adjacent, which the min_by stitch handles). */
  val qSequenceGaps: Q = Q(
    "q178_sequence_gaps",
    """WITH ids AS (SELECT event_id AS id FROM events
      |             WHERE event_type = 'purchase'),
      |g AS (SELECT id, lag(id) OVER (ORDER BY id) AS prev FROM ids)
      |SELECT CAST(prev + 1 AS BIGINT) AS gap_start,
      |       CAST(id - 1 AS BIGINT) AS gap_end,
      |       CAST(id - prev - 1 AS BIGINT) AS n_missing
      |FROM g WHERE prev IS NOT NULL AND id - prev > 1
      |ORDER BY n_missing DESC, gap_start LIMIT 10""".stripMargin
  ) { (s, d) =>
    val ids = Tables.events(s, d).filter(col("event_type") === "purchase")
      .select(col("event_id").as("id"),
        floor(col("event_id") / 1024).cast("long").as("band"))
    val wLoc = Window.partitionBy(col("band")).orderBy(col("id"))
    val intra = ids.withColumn("prev", lag(col("id"), 1).over(wLoc))
      .filter(col("prev").isNotNull && col("id") - col("prev") > 1)
      .select((col("prev") + 1).as("gap_start"), (col("id") - 1).as("gap_end"),
        (col("id") - col("prev") - 1).as("n_missing"))
    val bAgg = ids.groupBy(col("band"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
    val nxt = bAgg.select(col("band").as("a_band"), col("mx"))
      .join(bAgg.select(col("band").as("b_band"), col("mn")),
        col("b_band") > col("a_band"))
      .groupBy(col("a_band"), col("mx"))
      .agg(min_by(col("mn"), col("b_band")).as("nmn"))
    val cross = nxt.filter(col("nmn") - col("mx") > 1)
      .select((col("mx") + 1).as("gap_start"), (col("nmn") - 1).as("gap_end"),
        (col("nmn") - col("mx") - 1).as("n_missing"))
    intra.unionByName(cross)
      .orderBy(desc("n_missing"), col("gap_start")).limit(10)
      .orderBy(desc("n_missing"), col("gap_start"))
  }

  /** TOP-N PLUS "OTHERS" ROLLUP — the reporting pattern behind every
    * "top 3 accounts + everyone else" dashboard: per event type, the
    * three highest-spending users stay named and the long tail collapses
    * into one OTHERS row. Ranking happens on the per-(type, user)
    * AGGREGATE (|users|×|types| rows, already ≪ corpus after one
    * map-side-combined shuffle), and per-user totals are rounded to 6 dp
    * BEFORE ranking so fp sum association can't flip rank 3 vs 4 between
    * engines. The per-type window holds |users| rows — at extreme user
    * cardinality the q121 bounded-heap aggregator is the swap-in for the
    * named side; the OTHERS side is a plain re-aggregate either way. */
  val qTopNOthers: Q = Q(
    "q181_topn_others",
    """WITH u AS (SELECT event_type, user_id, round(sum(value), 6) AS total
      |           FROM events GROUP BY event_type, user_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
      |        ORDER BY total DESC, user_id) AS rk FROM u)
      |SELECT event_type,
      |  CASE WHEN rk <= 3 THEN CAST(user_id AS VARCHAR) ELSE 'OTHERS' END
      |    AS who,
      |  round(sum(total), 4) AS total_value,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM r GROUP BY event_type, who
      |ORDER BY event_type, n_users, total_value DESC, who""".stripMargin
  ) { (s, d) =>
    val u = Tables.events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(round(sum(col("value")), 6).as("total"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(desc("total"), col("user_id"))
    u.withColumn("rk", row_number().over(w))
      .withColumn("who", when(col("rk") <= 3,
        col("user_id").cast("string")).otherwise(lit("OTHERS")))
      .groupBy(col("event_type"), col("who"))
      .agg(round(sum(col("total")), 4).as("total_value"),
        count(lit(1)).as("n_users"))
      .orderBy(col("event_type"), col("n_users"), desc("total_value"),
        col("who"))
  }

  /** INTERVAL COVERAGE (union of overlapping intervals — the "how much
    * wall-clock was this user actually active" measure that plain
    * event counts and q45's gap sessionization both miss): each event
    * opens a 10-minute activity interval; overlapping intervals merge,
    * and the user's coverage is the summed length of the merged
    * islands. Gaps-and-islands via running MAX of interval ends per
    * user (ordered by start): a row opens a NEW island iff its start
    * exceeds every earlier end; island id = running count of openers;
    * covered = Σ per island (max end − island start). Everything is
    * user-keyed windows — micros arithmetic on longs, no interval
    * self-join, no per-user cross product (the naive overlap test is
    * O(n²) per user; this is O(n log n) sort-bounded). */
  val qIntervalCoverage: Q = Q(
    "q189_interval_coverage",
    """WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
      |             epoch_us(ts) + 600000000 AS e
      |            FROM events),
      |m AS (SELECT user_id, s, e,
      |        max(e) OVER (PARTITION BY user_id ORDER BY s, e
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |      FROM iv),
      |isl AS (SELECT user_id, s, e,
      |          CAST(sum(CASE WHEN prev_max IS NULL OR s > prev_max
      |            THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
      |            ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND
      |            CURRENT ROW) AS BIGINT) AS island
      |        FROM m)
      |SELECT user_id, CAST(count(DISTINCT island) AS BIGINT) AS n_islands,
      |       CAST(sum(len) // 60000000 AS BIGINT) AS covered_min
      |FROM (SELECT user_id, island, max(e) - min(s) AS len
      |      FROM isl GROUP BY user_id, island)
      |GROUP BY user_id ORDER BY user_id LIMIT 100""".stripMargin
  ) { (s, d) =>
    val iv = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 600000000L).as("e"))
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("user_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv.withColumn("prev_max", max(col("e")).over(wPrev))
      .withColumn("island",
        sum(when(col("prev_max").isNull || col("s") > col("prev_max"), 1L)
          .otherwise(0L)).over(wRun))
      .groupBy(col("user_id"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("len"))
      .groupBy(col("user_id"))
      // integer `div`, not `/`: both engines' float division + int cast
      // disagree on rounding (DuckDB rounds, Spark truncates); // and
      // div are exact on longs. The oracle also CASTs the quotient back
      // to BIGINT — DuckDB's sum(BIGINT) widens to HUGEINT, so without
      // it the hash compare sees decimal vs long on identical values.
      .agg(countDistinct(col("island")).as("n_islands"),
        expr("sum(len) div 60000000").as("covered_min"))
      .orderBy(col("user_id")).limit(100)
  }

  val all: Seq[Q] = Seq(qTopkPerGroup, qRanks, qCumsum, qLagLead,
    qRollingTime, qRollingRows, qCumMinMaxProd, qFill, qRollingMedian,
    qAutocorr, qInterpolate, qPctChange, qCumcount, qExpanding,
    qMergeOrdered, qGroupPctRank, qRollingCorr, qRankAverage,
    qParetoFrontier, qSequenceGaps, qTopNOthers, qIntervalCoverage)
}
