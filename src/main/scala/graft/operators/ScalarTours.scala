package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar function library tour (SURVEY.md §2.2 "Scalar function
  * library"): the pandas accessor families dask inherits (.str, .dt,
  * math, conditional, cast) mapped to codegen'd Spark built-ins —
  * never UDFs, so whole-stage codegen keeps the hot path fused.
  *
  * Cross-engine gotchas handled here (documented for the oracle SQL):
  * DuckDB `log` is log10 (Spark's is ln) → oracle uses `ln`; DuckDB
  * float→int CAST rounds while Spark truncates → casts go through
  * floor/round explicitly; DuckDB regexp_replace needs the 'g' flag to
  * match Spark's replace-all.
  *
  * Reference capability: the pandas accessor surface dask inherits, provisioned by the image default (dask_ssh_docker/__init__.py:307, bin/dask-ssh-docker:27-29; SURVEY §2.2 Tier B).
  */
object ScalarTours {

  /** String family: length/upper/lower/substr/concat_ws/trim/lpad/
    * reverse/regexp_replace/contains/startswith. */
  val qStrings: Q = Q(
    "q35_string_functions",
    """SELECT c_custkey,
      |  length(c_name) AS name_len,
      |  upper(c_mktsegment) AS seg_upper,
      |  lower(substr(c_name, 1, 8)) AS name_head,
      |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS tag,
      |  lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad,
      |  reverse(c_mktsegment) AS seg_rev,
      |  regexp_replace(c_name, '[aeiou]', '_', 'g') AS name_devowel,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
      |  contains(c_name, 'er') AS has_er,
      |  c_name LIKE 'C%' AS starts_c
      |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        length(col("c_name")).cast("long").as("name_len"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(substring(col("c_name"), 1, 8)).as("name_head"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("tag"),
        lpad(col("c_nationkey").cast("string"), 4, "0").as("nation_pad"),
        reverse(col("c_mktsegment")).as("seg_rev"),
        regexp_replace(col("c_name"), "[aeiou]", "_").as("name_devowel"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        col("c_name").contains("er").as("has_er"),
        col("c_name").startsWith("C").as("starts_c"))
      .orderBy(col("c_custkey"))
  }

  /** Date/time family: year/month/day/quarter/hour/minute/dayofweek/
    * date_trunc/date arithmetic/epoch. Spark dayofweek is 1=Sunday; DuckDB
    * dayofweek is 0=Sunday — aligned by subtracting 1 on the Spark side. */
  val qDates: Q = Q(
    "q36_datetime_functions",
    """SELECT event_id,
      |  year(ts) AS y, month(ts) AS mo, day(ts) AS dd,
      |  quarter(ts) AS q, hour(ts) AS h, minute(ts) AS mi,
      |  dayofweek(ts) AS dow,
      |  date_trunc('hour', ts) AS ts_hour,
      |  CAST(ts AS DATE) + 30 AS plus30d,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      |  date_diff('day', TIMESTAMP '2024-01-01', ts) AS days_since
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    Tables.events(s, d).filter(col("event_id") < 200)
      .select(col("event_id"),
        year(col("ts")).cast("long").as("y"), month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("dd"),
        quarter(col("ts")).cast("long").as("q"), hour(col("ts")).cast("long").as("h"),
        minute(col("ts")).cast("long").as("mi"),
        (dayofweek(col("ts")) - 1).cast("long").as("dow"),
        date_trunc("hour", col("ts")).as("ts_hour"),
        date_add(col("ts").cast("date"), 30).as("plus30d"),
        col("ts").cast("long").as("epoch_s"),
        datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")).cast("long").as("days_since"))
      .orderBy(col("event_id"))
  }

  /** Math family: abs/round/floor/ceil/sqrt/pow/ln/exp/sign/mod.
    * floor/ceil cast to BIGINT on both sides (Spark returns LONG, DuckDB
    * DOUBLE). */
  val qMath: Q = Q(
    "q37_math_functions",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS abs_ctr,
      |  round(l_extendedprice / 100, 1) AS price_h,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
      |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
      |  round(sqrt(l_quantity), 6) AS qty_sqrt,
      |  round(pow(l_quantity, 2), 1) AS qty_sq,
      |  round(ln(l_extendedprice), 6) AS price_ln,
      |  round(exp(l_discount), 6) AS disc_exp,
      |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      |  CAST(l_quantity AS BIGINT) % 7 AS qty_mod7
      |FROM lineitem WHERE l_orderkey < 300 ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_ctr"),
        round(col("l_extendedprice") / 100, 1).as("price_h"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(pow(col("l_quantity"), 2), 1).as("qty_sq"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(exp(col("l_discount")), 6).as("disc_exp"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        (col("l_quantity").cast("long") % 7).as("qty_mod7"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Conditional family: CASE/when, coalesce+nullif, greatest/least,
    * clip-to-range (dask `np.where`/`mask`/`fillna`/`clip`). */
  val qConditional: Q = Q(
    "q38_conditional_functions",
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice >= 300000 THEN 'big'
      |       WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'small' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
      |  greatest(o_totalprice, 50000.0) AS at_least_50k,
      |  least(greatest(o_totalprice, 100000.0), 400000.0) AS clipped,
      |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END AS is_hot
      |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        when(col("o_totalprice") >= 300000, "big")
          .when(col("o_totalprice") >= 100000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"),
        greatest(col("o_totalprice"), lit(50000.0)).as("at_least_50k"),
        least(greatest(col("o_totalprice"), lit(100000.0)), lit(400000.0))
          .as("clipped"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
          .otherwise(0).as("is_hot"))
      .orderBy(col("o_orderkey"))
  }

  /** Predicate tour: between / isin / isNull / not (dask boolean-mask
    * filters and the `query` DSL — Spark's SQL parser is the analog). */
  val qPredicates: Q = Q(
    "q39_filter_predicates",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
      |FROM lineitem
      |WHERE l_quantity BETWEEN 10 AND 12
      |  AND l_returnflag IN ('A', 'R')
      |  AND l_shipdate IS NOT NULL
      |  AND NOT (l_discount > 0.05)
      |  AND l_orderkey < 5000
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity").between(10, 12) &&
        col("l_returnflag").isin("A", "R") &&
        col("l_shipdate").isNotNull &&
        !(col("l_discount") > 0.05) &&
        col("l_orderkey") < 5000)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Cast tour: explicit type conversions with truncation semantics
    * pinned (Spark cast double→int truncates; DuckDB rounds → oracle
    * trunc()s first). */
  val qCasts: Q = Q(
    "q40_cast_tour",
    """SELECT o_orderkey,
      |  CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
      |  CAST(o_totalprice AS VARCHAR) AS price_str,
      |  CAST(o_orderkey AS DOUBLE) AS key_dbl,
      |  CAST(o_orderdate AS DATE) AS ordate,
      |  CAST(CAST(o_orderkey % 2 AS BOOLEAN) AS INTEGER) AS odd_flag
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).filter(col("o_orderkey") < 1000)
      .select(col("o_orderkey"),
        col("o_totalprice").cast("long").as("price_int"),
        col("o_totalprice").cast("string").as("price_str"),
        col("o_orderkey").cast("double").as("key_dbl"),
        col("o_orderdate").cast("date").as("ordate"),
        (col("o_orderkey") % 2).cast("boolean").cast("int").as("odd_flag"))
      .orderBy(col("o_orderkey"))
  }

  /** pandas NA family as DataFrameNaFunctions (`fillna` → na.fill,
    * `dropna` → na.drop, `replace` → na.replace): the fixtures carry no
    * nulls, so nullif() manufactures them first — which also exercises
    * the null-production side (pandas `mask`'s inverse). n_complete is
    * the na.drop("any") survivor count riding along as a broadcast
    * 1-row aggregate. */
  val qNaFamily: Q = Q(
    "q112_na_family",
    """WITH base AS (SELECT nullif(l_returnflag, 'N') AS flag_n,
      |                     nullif(l_quantity, 1.0) AS qty_n
      |              FROM lineitem),
      |kept AS (SELECT count(*) AS n_complete FROM base
      |         WHERE flag_n IS NOT NULL AND qty_n IS NOT NULL),
      |filled AS (SELECT CASE WHEN coalesce(flag_n, 'X') = 'R' THEN 'RET'
      |                       ELSE coalesce(flag_n, 'X') END AS flag,
      |                  coalesce(qty_n, 0.0) AS qty
      |           FROM base)
      |SELECT flag, count(*) AS n, round(sum(qty), 2) AS sum_qty,
      |       count(*) FILTER (WHERE qty = 0.0) AS n_filled,
      |       (SELECT n_complete FROM kept) AS n_complete
      |FROM filled GROUP BY flag ORDER BY flag""".stripMargin
  ) { (s, d) =>
    val base = Tables.lineitem(s, d).select(
      expr("nullif(l_returnflag, 'N')").as("flag_n"),
      expr("nullif(l_quantity, 1.0D)").as("qty_n"))
    val kept = base.na.drop("any")
      .agg(count(lit(1)).as("n_complete"))
    base.na.fill(Map("flag_n" -> "X", "qty_n" -> 0.0))
      .na.replace("flag_n", Map("R" -> "RET"))
      .groupBy(col("flag_n").as("flag"))
      .agg(count(lit(1)).as("n"), round(sum(col("qty_n")), 2).as("sum_qty"),
        count(when(col("qty_n") === 0.0, 1)).as("n_filled"))
      .crossJoin(broadcast(kept))
      .orderBy(col("flag"))
  }

  /** TIMESTAMP_NTZ-native datetime family. Tz-NAIVE timestamps are the
    * pandas/Dask DEFAULT (`pd.to_datetime` yields naive values; the
    * deployed image provisions exactly that stack,
    * dask_ssh_docker/__init__.py:307), and the regenerated fixture
    * ships `events.ts` as parquet µs-NTZ — so naive datetimes are a
    * first-class engine type here, not just a loader normalization
    * (the r7 lesson). The tour re-derives the NTZ reading
    * (`cast(ts as timestamp_ntz)` under the pinned-UTC session is
    * bit-identical to DuckDB's naive read) and runs the accessor
    * family DIRECTLY on TIMESTAMP_NTZ inputs: truncation, field
    * extraction, interval arithmetic, timestampdiff — plus the
    * naive→instant bridge (`cast` back under UTC) that pandas
    * `tz_localize('UTC')` performs. All codegen'd built-ins; NTZ stays
    * NTZ through the plan (day_ntz/plus90m keep the type). */
  val qNtzTour: Q = Q(
    "q184_ntz_datetime_family",
    """SELECT event_id,
      |  ts AS ts_ntz,
      |  date_trunc('day', ts) AS day_ntz,
      |  hour(ts) AS hr,
      |  dayofweek(ts) AS dow,
      |  weekofyear(ts) AS wk,
      |  ts + INTERVAL 90 MINUTE AS plus90m,
      |  date_diff('minute', date_trunc('day', ts), ts) AS min_into_day,
      |  epoch_us(ts) AS epoch_us_utc
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin
  ) { (s, d) =>
    val ntz = col("ts").cast("timestamp_ntz")
    Tables.events(s, d).filter(col("event_id") < 200)
      .withColumn("ts_ntz", ntz)
      .select(col("event_id"), col("ts_ntz"),
        // date_trunc is the one family member that widens NTZ → LTZ
        // (SPARK date_trunc returns TIMESTAMP); cast back at the
        // boundary — identity on wall values under the UTC session
        date_trunc("day", col("ts_ntz")).cast("timestamp_ntz").as("day_ntz"),
        hour(col("ts_ntz")).cast("long").as("hr"),
        (dayofweek(col("ts_ntz")) - 1).cast("long").as("dow"),
        weekofyear(col("ts_ntz")).cast("long").as("wk"),
        (col("ts_ntz") + expr("INTERVAL 90 MINUTES")).as("plus90m"),
        expr("timestampdiff(MINUTE, date_trunc('day', ts_ntz), ts_ntz)")
          .cast("long").as("min_into_day"),
        unix_micros(col("ts_ntz").cast("timestamp")).as("epoch_us_utc"))
      .orderBy(col("event_id"))
  }

  val all: Seq[Q] = Seq(qStrings, qDates, qMath, qConditional, qPredicates,
    qCasts, qNaFamily, qNtzTour)
}
