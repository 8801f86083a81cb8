package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Product-analytics surface over the events fixture: ordered funnel,
  * retention cohorts, time-to-convert, event transition matrix, rolling
  * 7-day active users, and last-touch attribution.
  *
  * These are the event-sequence queries a user of the reference image runs
  * with pandas groupby/merge chains on the provisioned workers
  * (dask_ssh_docker/__init__.py:307 ships the full dataframe surface);
  * here each is a declarative Spark plan with a DuckDB oracle twin.
  *
  * Scale discipline shared by the family: every per-user sequence step is
  * either a hash aggregate keyed on user_id (map-side combine) or a window
  * partitioned on user_id — no self-join over the raw event log, no
  * driver-side iteration. At 100 TB the event table shuffles once per
  * stage on user_id and all cross-stage joins are user-keyed (AQE picks
  * broadcast when a funnel stage collapses to a small survivor set).
  */
object Analytics {

  /** Ordered conversion funnel signup → view → purchase: each stage keeps
    * users whose stage event STRICTLY FOLLOWS their previous stage time
    * (min-ts semantics, the standard product-funnel definition). Three
    * shrinking hash aggregates joined on user_id; the final stage counts
    * are 1-row aggregates combined by cross join (broadcast, 1×1 rows). */
  val qFunnel: Q = Q(
    "q143_funnel",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |  JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |  JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM s1) AS n_signup,
      |       (SELECT count(*) FROM s2) AS n_signup_view,
      |       (SELECT count(*) FROM s3) AS n_full_funnel""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view")
      .join(s1, "user_id").where(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_signup_view")))
      .crossJoin(s3.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** Weekly retention cohorts: cohort = Monday-truncated week of a user's
    * FIRST event; a cohort row counts distinct users active k weeks later.
    * Two hash aggregates (first-event per user, distinct user-weeks) and
    * one user-keyed join; the cohort table itself is tiny (weeks², not
    * users), so the output never needs a second shuffle. Both engines
    * date_trunc to Monday, so the day difference is an exact multiple
    * of 7 and integer division is engine-agnostic. */
  val qRetention: Q = Q(
    "q144_retention_cohorts",
    """WITH first_ev AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      |  FROM events GROUP BY user_id),
      |active AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events)
      |SELECT f.cohort AS cohort,
      |       CAST(datediff('day', f.cohort, a.wk) // 7 AS INTEGER) AS week_offset,
      |       count(*) AS n_active
      |FROM active a JOIN first_ev f ON a.user_id = f.user_id
      |GROUP BY cohort, week_offset ORDER BY cohort, week_offset""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val firstEv = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
    val active = ev
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    active.join(firstEv, "user_id")
      .groupBy(col("cohort"),
        (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Time-to-convert: hours from a user's first signup to their first
    * purchase AFTER that signup. Microsecond epoch arithmetic on both
    * sides (second-truncating unix_timestamp would diverge from DuckDB's
    * epoch_us); identical association `(us2 - us1) / 3.6e9`. percentile()
    * and DuckDB median() are both the exact interpolated type-7 quantile.
    * One row out; the heavy lifting is two user-keyed hash aggregates. */
  val qTimeToConvert: Q = Q(
    "q145_time_to_convert",
    """WITH s1 AS (
      |  SELECT user_id, min(ts) AS t1 FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id),
      |conv AS (
      |  SELECT e.user_id,
      |         (epoch_us(min(e.ts)) - epoch_us(min(s1.t1))) / 3600000000.0 AS hours
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id)
      |SELECT count(*) AS n_converted,
      |       round(avg(hours), 4) AS avg_hours,
      |       round(median(hours), 4) AS med_hours
      |FROM conv""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val conv = ev.filter(col("event_type") === "purchase")
      .join(s1, "user_id").where(col("ts") > col("t1"))
      .groupBy(col("user_id"))
      .agg(((unix_micros(min(col("ts"))) - unix_micros(min(col("t1"))))
        / lit(3600000000.0)).as("hours"))
    conv.agg(count(lit(1)).as("n_converted"),
      round(avg(col("hours")), 4).as("avg_hours"),
      round(expr("percentile(hours, 0.5)"), 4).as("med_hours"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * lead() within the user's timeline, then count + row-normalized
    * probability per source state. One window shuffle on user_id, one
    * 25-row aggregate; the probability window runs on that 25-row frame.
    * `ts` is unique in the fixture so the ordering is deterministic
    * (q130's tie note applies — a real pipeline breaks ties on event_id). */
  val qTransitions: Q = Q(
    "q146_transition_matrix",
    """WITH seq AS (
      |  SELECT event_type AS src,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts) AS dst
      |  FROM events)
      |SELECT src, dst, count(*) AS n,
      |       round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY src), 4) AS p
      |FROM seq WHERE dst IS NOT NULL
      |GROUP BY src, dst ORDER BY src, dst""".stripMargin
  ) { (s, d) =>
    val wSeq = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val seq0 = Tables.events(s, d)
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(wSeq).as("dst"))
      .where(col("dst").isNotNull)
    val counts = seq0.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    counts
      .withColumn("p",
        round(col("n") * lit(1.0) / sum(col("n")).over(Window.partitionBy(col("src"))), 4))
      .orderBy(col("src"), col("dst"))
  }

  /** Rolling 7-day distinct active users (WAU per day). Scale path: each
    * distinct (user, day) contributes to the 7 windows it can serve via a
    * bounded `sequence` explode (7×, constant), then a dedup and a count —
    * NOT the O(days × users) range self-join the oracle uses (correct as
    * an oracle, quadratic as a plan). Restricting to observed days rides
    * a broadcast join against the tiny day spine. */
  val qRollingWau: Q = Q(
    "q147_rolling_wau",
    """SELECT d.day AS day, count(DISTINCT u.user_id) AS wau
      |FROM (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events) d
      |JOIN (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |      FROM events) u
      |  ON u.day BETWEEN d.day - 6 AND d.day
      |GROUP BY d.day ORDER BY day""".stripMargin
  ) { (s, d) =>
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val spine = ud.select(col("day")).distinct()
    ud.select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .dropDuplicates("user_id", "day")
      .join(broadcast(spine), "day")
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      .orderBy(col("day"))
  }

  /** Last-touch attribution: each purchase is credited to the user's most
    * recent PRECEDING non-purchase event type (frame ends at 1 PRECEDING —
    * a purchase never attributes to itself); purchases with no prior touch
    * fall into 'none'. One user-partitioned window + one 5-row aggregate.
    * last(ignoreNulls) over a running frame is Spark's IGNORE NULLS
    * last_value — same semantics as the DuckDB twin. */
  val qAttribution: Q = Q(
    "q148_last_touch_attribution",
    """WITH w AS (
      |  SELECT event_type, value,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
      |                    IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS channel
      |  FROM events)
      |SELECT coalesce(channel, 'none') AS channel,
      |       count(*) AS n_purchases, round(sum(value), 2) AS revenue
      |FROM w WHERE event_type = 'purchase'
      |GROUP BY channel ORDER BY channel""".stripMargin
  ) { (s, d) =>
    val wTouch = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(wTouch))
      .where(col("event_type") === "purchase")
      .groupBy(coalesce(col("channel"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("revenue"))
      .orderBy(col("channel"))
  }

  /** Frame profiler (pandas `df.info()`/dask `describe(include='all')`:
    * the first look at an unknown table): per-column null count,
    * distinct count, numeric min/max. ONE aggregate scan computes every
    * metric (the multi-DISTINCT expand is ×k for k profiled columns —
    * bounded by the schema width, documented trade for a single pass),
    * then `stack` unpivots the 1-row result driver-side-free. Timestamps
    * profile as µs epochs so no engine-specific string formatting leaks
    * into the compare. */
  val qProfile: Q = Q(
    "q152_profile",
    """WITH a AS (SELECT
      |  count(*) AS n,
      |  count(event_id) AS c1, count(DISTINCT event_id) AS d1,
      |    min(event_id * 1.0) AS mn1, max(event_id * 1.0) AS mx1,
      |  count(ts) AS c2, count(DISTINCT ts) AS d2,
      |    min(epoch_us(ts) * 1.0) AS mn2, max(epoch_us(ts) * 1.0) AS mx2,
      |  count(user_id) AS c3, count(DISTINCT user_id) AS d3,
      |    min(user_id * 1.0) AS mn3, max(user_id * 1.0) AS mx3,
      |  count(event_type) AS c4, count(DISTINCT event_type) AS d4,
      |  count(value) AS c5, count(DISTINCT value) AS d5,
      |    min(value) AS mn5, max(value) AS mx5,
      |  count(props) AS c6, count(DISTINCT props) AS d6
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'event_id' AS col, n - c1 AS n_null, d1 AS n_distinct,
      |         round(mn1, 4) AS min_num, round(mx1, 4) AS max_num FROM a
      |  UNION ALL SELECT 'ts', n - c2, d2, round(mn2, 4), round(mx2, 4) FROM a
      |  UNION ALL SELECT 'user_id', n - c3, d3, round(mn3, 4), round(mx3, 4) FROM a
      |  UNION ALL SELECT 'event_type', n - c4, d4, NULL, NULL FROM a
      |  UNION ALL SELECT 'value', n - c5, d5, round(mn5, 4), round(mx5, 4) FROM a
      |  UNION ALL SELECT 'props', n - c6, d6, NULL, NULL FROM a)
      |ORDER BY col""".stripMargin
  ) { (s, d) =>
    val nullD = lit(null).cast("double")
    val agg = Tables.events(s, d).agg(
      count(lit(1)).as("n"),
      count(col("event_id")).as("c1"), countDistinct(col("event_id")).as("d1"),
      min(col("event_id") * 1.0).as("mn1"), max(col("event_id") * 1.0).as("mx1"),
      count(col("ts")).as("c2"), countDistinct(col("ts")).as("d2"),
      min(unix_micros(col("ts")) * 1.0).as("mn2"),
      max(unix_micros(col("ts")) * 1.0).as("mx2"),
      count(col("user_id")).as("c3"), countDistinct(col("user_id")).as("d3"),
      min(col("user_id") * 1.0).as("mn3"), max(col("user_id") * 1.0).as("mx3"),
      count(col("event_type")).as("c4"), countDistinct(col("event_type")).as("d4"),
      count(col("value")).as("c5"), countDistinct(col("value")).as("d5"),
      min(col("value")).as("mn5"), max(col("value")).as("mx5"),
      count(col("props")).as("c6"), countDistinct(col("props")).as("d6"))
    def row(name: String, c: String, dd: String, mn: Column, mx: Column) =
      struct(lit(name).as("col"), (col("n") - col(c)).as("n_null"),
        col(dd).as("n_distinct"), mn.as("min_num"), mx.as("max_num"))
    agg.select(explode(array(
        row("event_id", "c1", "d1", round(col("mn1"), 4), round(col("mx1"), 4)),
        row("ts", "c2", "d2", round(col("mn2"), 4), round(col("mx2"), 4)),
        row("user_id", "c3", "d3", round(col("mn3"), 4), round(col("mx3"), 4)),
        row("event_type", "c4", "d4", nullD, nullD),
        row("value", "c5", "d5", round(col("mn5"), 4), round(col("mx5"), 4)),
        row("props", "c6", "d6", nullD, nullD))).as("r"))
      .select(col("r.*"))
      .orderBy(col("col"))
  }

  /** SCD2 compaction (gaps-and-islands): collapse a user's daily value
    * tier into validity intervals [valid_from, valid_to] — the
    * slowly-changing-dimension build every warehouse runs. Change flags
    * via lag(), island ids via a running sum, then ONE groupBy per
    * (user, island). All three windows share the (user_id, day) sort —
    * a single exchange+sort at scale. Bounded to user_id < 20 so the
    * interval table stays a readable fixture output. */
  val qScd2: Q = Q(
    "q153_scd2_intervals",
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         CAST(floor(avg(value) / 50) AS BIGINT) AS tier
      |  FROM events WHERE user_id < 20 GROUP BY user_id, day),
      |flagged AS (
      |  SELECT user_id, day, tier,
      |         CASE WHEN tier = lag(tier) OVER w THEN 0 ELSE 1 END AS chg
      |  FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)),
      |islands AS (
      |  SELECT user_id, day, tier,
      |         sum(chg) OVER (PARTITION BY user_id ORDER BY day
      |                        ROWS UNBOUNDED PRECEDING) AS seg
      |  FROM flagged)
      |SELECT user_id, min(day) AS valid_from, max(day) AS valid_to,
      |       min(tier) AS tier, CAST(count(*) AS BIGINT) AS n_days
      |FROM islands GROUP BY user_id, seg
      |ORDER BY user_id, valid_from""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val daily = Tables.events(s, d).filter(col("user_id") < 20)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(floor(avg(col("value")) / 50).as("tier"))
    val flagged = daily.withColumn("chg",
      when(col("tier") === lag(col("tier"), 1).over(w), 0).otherwise(1))
    val islands = flagged.withColumn("seg",
      sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    islands.groupBy(col("user_id"), col("seg"))
      .agg(min(col("day")).as("valid_from"), max(col("day")).as("valid_to"),
        min(col("tier")).as("tier"), count(lit(1)).as("n_days"))
      .drop("seg")
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** Per-user activity bitmap: day-of-month presence packed into one
    * BIGINT via bit_or(1 << (day−1)) — the roaring-bitmap-style compact
    * activity encoding (30 days → 8 bytes/user instead of a user×day
    * table). n_days_active = popcount. One hash aggregate with map-side
    * bit_or partials; the bitmap column then supports O(1) bitwise
    * cohort intersections downstream. */
  val qActivityBitmap: Q = Q(
    "q154_activity_bitmap",
    """SELECT user_id,
      |       bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)) AS bitmap,
      |       CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (day(ts) - 1)))
      |            AS BIGINT) AS n_days_active
      |FROM events WHERE user_id < 40
      |GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    val bit = expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)")
    Tables.events(s, d).filter(col("user_id") < 40)
      .groupBy(col("user_id"))
      .agg(bit_or(bit).as("bitmap"),
        bit_count(bit_or(bit)).cast("long").as("n_days_active"))
      .orderBy(col("user_id"))
  }

  /** Cohort LTV curve: cumulative purchase revenue per first-event-week
    * cohort, normalized by cohort size — the lifetime-value trajectory
    * read directly off q144's cohort frame. The cumulative window runs
    * over the weeks²-bounded cohort table (never user-sized rows), and
    * cohort sizes broadcast back onto it. */
  val qLtvCurve: Q = Q(
    "q155_cohort_ltv",
    """WITH first_ev AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      |  FROM events GROUP BY user_id),
      |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
      |       FROM first_ev GROUP BY cohort),
      |rev AS (
      |  SELECT f.cohort,
      |         CAST(datediff('day', f.cohort,
      |              CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS INTEGER)
      |           AS week_offset,
      |         sum(e.value) AS rev
      |  FROM events e JOIN first_ev f ON e.user_id = f.user_id
      |  WHERE e.event_type = 'purchase' GROUP BY 1, 2)
      |SELECT r.cohort AS cohort, r.week_offset AS week_offset, sz.n_users,
      |       round(sum(r.rev) OVER (PARTITION BY r.cohort ORDER BY r.week_offset)
      |             / sz.n_users, 4) AS ltv_per_user
      |FROM rev r JOIN sz ON r.cohort = sz.cohort
      |ORDER BY cohort, week_offset""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val firstEv = ev.groupBy(col("user_id"))
      .agg(to_date(date_trunc("week", min(col("ts")))).as("cohort"))
    val sz = firstEv.groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
    val rev = ev.filter(col("event_type") === "purchase")
      .join(firstEv, "user_id")
      .groupBy(col("cohort"),
        (datediff(to_date(date_trunc("week", col("ts"))), col("cohort")) / 7)
          .cast("int").as("week_offset"))
      .agg(sum(col("value")).as("rev"))
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("week_offset"))
    rev.join(broadcast(sz), "cohort")
      .select(col("cohort"), col("week_offset"), col("n_users"),
        round(sum(col("rev")).over(wCum) / col("n_users"), 4).as("ltv_per_user"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  /** Top event paths (3-step Sankey / user-journey mining): trigrams of
    * consecutive event types per user timeline via two lead()s sharing
    * one (user, ts) sort, counted and cut to the top 10 — the path table
    * is |types|³-bounded, so the final sort is a TakeOrdered over at
    * most 125 rows. */
  val qTopPaths: Q = Q(
    "q156_top_paths",
    """WITH seq AS (
      |  SELECT event_type AS s1,
      |         lead(event_type, 1) OVER w AS s2,
      |         lead(event_type, 2) OVER w AS s3
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
      |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
      |FROM seq WHERE s3 IS NOT NULL
      |GROUP BY s1, s2, s3 ORDER BY n DESC, s1, s2, s3 LIMIT 10""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(s, d)
      .select(col("event_type").as("s1"),
        lead(col("event_type"), 1).over(w).as("s2"),
        lead(col("event_type"), 2).over(w).as("s3"))
      .where(col("s3").isNotNull)
      .groupBy(col("s1"), col("s2"), col("s3")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("s1"), col("s2"), col("s3")).limit(10)
  }

  /** Session-level distribution summary over q45's session frame
    * (duration minutes, events/session, value/session): the "how do
    * sessions look" dashboard scalar row. Same two shared-sort windows
    * as q45, then one global 1-row aggregate. */
  val qSessionStats: Q = Q(
    "q161_session_stats",
    """WITH flagged AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         >= 1800000000 THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |s AS (SELECT user_id, session_id,
      |        (epoch_us(max(ts)) - epoch_us(min(ts))) / 60000000.0 AS mins,
      |        count(*) AS n_events, sum(value) AS v
      |      FROM sessions GROUP BY user_id, session_id)
      |SELECT CAST(count(*) AS BIGINT) AS n_sessions,
      |       round(avg(mins), 4) AS avg_minutes,
      |       round(median(mins), 4) AS med_minutes,
      |       round(avg(n_events), 4) AS avg_events,
      |       round(avg(v), 4) AS avg_value
      |FROM s""".stripMargin
  ) { (s, d) =>
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d)
      .withColumn("new_session",
        when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
          >= 1800000000L, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
        / lit(60000000.0)).as("mins"),
        count(lit(1)).as("n_events"), sum(col("value")).as("v"))
      .agg(count(lit(1)).as("n_sessions"),
        round(avg(col("mins")), 4).as("avg_minutes"),
        round(expr("percentile(mins, 0.5)"), 4).as("med_minutes"),
        round(avg(col("n_events")), 4).as("avg_events"),
        round(avg(col("v")), 4).as("avg_value"))
  }

  /** Share-of-total contribution (`ratio_to_report`): each event type's
    * revenue share. The SQL-window form puts every row in ONE unbounded
    * frame; here the total is a 1-row broadcast cross join onto the
    * category-bounded aggregate — the scale-safe spelling. */
  val qShareOfTotal: Q = Q(
    "q162_share_of_total",
    """WITH tot AS (SELECT sum(value) AS t FROM events)
      |SELECT event_type, round(sum(value), 2) AS revenue,
      |       round(sum(value) / t, 6) AS share
      |FROM events CROSS JOIN tot GROUP BY event_type, t
      |ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val tot = ev.agg(sum(col("value")).as("t"))
    ev.groupBy(col("event_type"))
      .agg(round(sum(col("value")), 2).as("revenue"), sum(col("value")).as("_s"))
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("revenue"),
        round(col("_s") / col("t"), 6).as("share"))
      .orderBy(col("event_type"))
  }

  /** RFM segmentation (marketing's recency/frequency/monetary quintile
    * grid): each dimension ranks through `Scale.globalRowNumber` +
    * `ntileFromRowNumber` — SQL-ntile semantics with NO single-partition
    * window even at 10⁹ customers (the oracle's plain ntile() is the
    * semantics contract, not the plan). Output is the segment grid
    * (≤125 cells), never user-sized.
    *
    * The user table is [[Scale.cut]] once; the three quintiles are
    * INDEPENDENT branches over that materialized base, joined back on
    * user_id — the r6 form chained them, and since globalRowNumber
    * references its input from the window, the count table, AND the
    * broadcast total, the chain recomputed the events aggregate ~27×
    * (4.1 s warm in the r6 bench). Band edges for all three metrics
    * come from ONE multi-column [[Scale.quantileEdges]] pass —
    * data-derived quantile bands, so #buckets stays ≤64 whatever the
    * metric's range (the fixed `floor(m/500)` band width was fixture
    * arithmetic that would blow up the #buckets² offsets join on real
    * revenue distributions). Total: one events scan, one quantile job
    * over the cut base, three bounded rank branches, two |users| joins. */
  val qRfm: Q = Q(
    "q163_rfm_segments",
    """WITH rfm AS (
      |  SELECT user_id, max(epoch_us(ts)) AS r_us,
      |         CAST(count(*) AS BIGINT) AS f, sum(value) AS m
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
      |q AS (SELECT ntile(5) OVER (ORDER BY r_us, user_id) AS r_q,
      |             ntile(5) OVER (ORDER BY f, user_id) AS f_q,
      |             ntile(5) OVER (ORDER BY m, user_id) AS m_q,
      |             m FROM rfm)
      |SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users,
      |       round(sum(m), 2) AS monetary
      |FROM q GROUP BY r_q, f_q, m_q ORDER BY r_q, f_q, m_q""".stripMargin
  ) { (s, d) =>
    // pinned, not cut (optimization r19): static lineage, many readers
    // (quantile pass + three rank branches + two joins) — the cache
    // computes it once with zero extra jobs where the eager cut paid two
    val rfm = Scale.pin(
      Tables.events(s, d).filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(unix_micros(col("ts"))).as("r_us"), count(lit(1)).as("f"),
          sum(col("value")).as("m")))
    val metrics = Seq(col("r_us"), col("f"), col("m"))
    val edges = Scale.quantileEdges(rfm, metrics, 64)
    val n1 = rfm.agg(count(lit(1)).as("_n"))
    def quintile(metric: Column, es: Array[Double], out: String): DataFrame =
      Scale.globalRowNumber(rfm, Scale.bucketsFromEdges(metric, es),
          Seq(metric, col("user_id")), "_rn")
        .join(broadcast(n1), lit(true))
        .select(col("user_id"),
          Scale.ntileFromRowNumber(col("_rn"), col("_n"), 5).as(out),
          col("m"))
    val q3 = quintile(col("r_us"), edges(0), "r_q")
      .join(quintile(col("f"), edges(1), "f_q").drop("m"), "user_id")
      .join(quintile(col("m"), edges(2), "m_q").drop("m"), "user_id")
    q3.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"), round(sum(col("m")), 2).as("monetary"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  /** Growth accounting (the new/retained/resurrected/churned weekly
    * ledger): per-user week classification from ONE (user, week) window
    * pass; churn falls out of the week-level ledger as
    * prev-week actives − current retained, via a weeks-bounded broadcast
    * self-join (no global window, no second scan of the event log). */
  val qGrowthAccounting: Q = Q(
    "q164_growth_accounting",
    """WITH uw AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      |  FROM events),
      |classed AS (
      |  SELECT wk,
      |    CASE WHEN wk = min(wk) OVER (PARTITION BY user_id) THEN 'new'
      |         WHEN lag(wk) OVER (PARTITION BY user_id ORDER BY wk) = wk - 7
      |           THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM uw),
      |weekly AS (
      |  SELECT wk,
      |    CAST(count(*) FILTER (WHERE cls = 'new') AS BIGINT) AS n_new,
      |    CAST(count(*) FILTER (WHERE cls = 'retained') AS BIGINT) AS n_retained,
      |    CAST(count(*) FILTER (WHERE cls = 'resurrected') AS BIGINT)
      |      AS n_resurrected,
      |    CAST(count(*) AS BIGINT) AS n_active
      |  FROM classed GROUP BY wk)
      |SELECT w.wk AS wk, w.n_new, w.n_retained, w.n_resurrected, w.n_active,
      |       coalesce(p.n_active - w.n_retained, 0) AS n_churned
      |FROM weekly w LEFT JOIN weekly p ON p.wk = w.wk - 7
      |ORDER BY wk""".stripMargin
  ) { (s, d) =>
    val uw = Tables.events(s, d)
      .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .distinct()
    val wAll = Window.partitionBy(col("user_id"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    val classed = uw.select(col("wk"),
      when(col("wk") === min(col("wk")).over(wAll), "new")
        .when(lag(col("wk"), 1).over(wOrd) === date_sub(col("wk"), 7), "retained")
        .otherwise("resurrected").as("cls"))
    val weekly = classed.groupBy(col("wk")).agg(
      count(when(col("cls") === "new", 1)).as("n_new"),
      count(when(col("cls") === "retained", 1)).as("n_retained"),
      count(when(col("cls") === "resurrected", 1)).as("n_resurrected"),
      count(lit(1)).as("n_active"))
    val prev = weekly.select((col("wk") + expr("INTERVAL 7 DAYS")).cast("date")
      .as("wk"), col("n_active").as("_pa"))
    weekly.join(broadcast(prev), Seq("wk"), "left")
      .select(col("wk"), col("n_new"), col("n_retained"), col("n_resurrected"),
        col("n_active"),
        coalesce(col("_pa") - col("n_retained"), lit(0L)).as("n_churned"))
      .orderBy(col("wk"))
  }

  /** Data-expectations audit (the Great-Expectations/dbt-test contract
    * sweep): declared rules → violation counts in one result frame.
    * Range/null rules are conditional counts inside single passes;
    * referential integrity is an anti join against the broadcast-able
    * key side; uniqueness re-aggregates the key groupBy. Violations
    * REPORT here (the audit form); `Joins.mergeValidated` is the
    * fail-loud in-plan form of the same contract. */
  val qExpectations: Q = Q(
    "q165_expectations",
    """SELECT * FROM (
      |  SELECT 'lineitem_qty_range' AS rule,
      |    CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
      |      AS BIGINT) AS n_violations FROM lineitem
      |  UNION ALL SELECT 'orders_price_positive',
      |    CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'orders_custkey_not_null',
      |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) FROM orders
      |  UNION ALL SELECT 'orders_custkey_fk',
      |    (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |     LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |     WHERE c.c_custkey IS NULL)
      |  UNION ALL SELECT 'lineitem_pk_unique',
      |    (SELECT CAST(coalesce(sum(cnt - 1), 0) AS BIGINT) FROM
      |     (SELECT count(*) AS cnt FROM lineitem
      |      GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1)))
      |ORDER BY rule""".stripMargin
  ) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    def r(name: String, cnt: DataFrame): DataFrame =
      cnt.select(lit(name).as("rule"), col("n").cast("long").as("n_violations"))
    val r1 = r("lineitem_qty_range", li.agg(
      count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)).as("n")))
    val r2 = r("orders_price_positive", o.agg(
      count(when(col("o_totalprice") <= 0, 1)).as("n")))
    val r3 = r("orders_custkey_not_null", o.agg(
      count(when(col("o_custkey").isNull, 1)).as("n")))
    val r4 = r("orders_custkey_fk", o.join(c,
      col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")))
    val r5 = r("lineitem_pk_unique", li
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt") - 1), lit(0L)).as("n")))
    r1.union(r2).union(r3).union(r4).union(r5).orderBy(col("rule"))
  }

  /** Point-in-time-correct feature join (the feature-store leakage
    * guard): each label event is enriched with the LATEST weekly feature
    * snapshot whose validity start (week end) is at-or-before the label
    * time — features never see the label's own week. Same union + one
    * shuffle + ordered-window as-of machinery as q46 (snapshot kind
    * sorts first at ties → inclusive bound, ASOF `>=`); the snapshot
    * side is (user × week)-bounded, cumulated by a per-user window
    * BEFORE the join, so the event log is scanned once per side and
    * nothing user-sized crosses a broadcast. */
  val qPitFeatures: Q = Q(
    "q166_point_in_time_features",
    """WITH wk AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS w,
      |         CAST(count(*) AS BIGINT) AS n,
      |         sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END) AS r
      |  FROM events GROUP BY user_id, w),
      |snap AS (
      |  SELECT user_id, CAST(w + 7 AS TIMESTAMP) AS snap_ts,
      |         CAST(sum(n) OVER (PARTITION BY user_id ORDER BY w) AS BIGINT)
      |           AS cum_events,
      |         round(sum(r) OVER (PARTITION BY user_id ORDER BY w), 2) AS cum_rev
      |  FROM wk),
      |lbl AS (SELECT event_id, user_id, ts, value FROM events
      |        WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-15')
      |SELECT l.event_id, l.user_id, l.value,
      |       s.cum_events AS feat_cum_events, s.cum_rev AS feat_cum_rev
      |FROM lbl l ASOF LEFT JOIN snap s
      |  ON l.user_id = s.user_id AND l.ts >= s.snap_ts
      |ORDER BY l.event_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val wk = ev.groupBy(col("user_id"),
        to_date(date_trunc("week", col("ts"))).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", col("value"))
          .otherwise(lit(0.0))).as("r"))
    val wCum = Window.partitionBy(col("user_id")).orderBy(col("w"))
    val snap = wk.select(col("user_id"),
      date_add(col("w"), 7).cast("timestamp").as("ts"), lit(0).as("kind"),
      lit(null).cast("long").as("event_id"), lit(null).cast("double").as("value"),
      sum(col("n")).over(wCum).as("s_events"),
      round(sum(col("r")).over(wCum), 2).as("s_rev"))
    val lbl = ev.filter(col("event_type") === "purchase" &&
        col("ts") >= lit("2024-01-15").cast("timestamp"))
      .select(col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
        col("value"), lit(null).cast("long").as("s_events"),
        lit(null).cast("double").as("s_rev"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    snap.unionByName(lbl)
      .withColumn("feat_cum_events",
        last(col("s_events"), ignoreNulls = true).over(w))
      .withColumn("feat_cum_rev", last(col("s_rev"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("value"),
        col("feat_cum_events"), col("feat_cum_rev"))
      .orderBy(col("event_id"))
  }

  /** pandas `groupby.filter(lambda g: pred(g))`: keep the member ROWS of
    * groups whose aggregate passes — here purchase events of users with
    * ≥ 500 total purchase revenue. Spelled as aggregate → semi join (the
    * survivor-key side is an aggregate, broadcast-able when selective)
    * rather than a window flag, so the fat side is never re-shuffled on
    * a second pass. Output bounded to user_id < 30. */
  val qGroupFilter: Q = Q(
    "q170_group_filter",
    """WITH big AS (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  GROUP BY user_id HAVING sum(value) >= 500)
      |SELECT e.event_id, e.user_id, e.value
      |FROM events e JOIN big ON e.user_id = big.user_id
      |WHERE e.event_type = 'purchase' AND e.user_id < 30
      |ORDER BY e.event_id""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val big = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(sum(col("value")).as("_t"))
      .filter(col("_t") >= 500).select("user_id")
    ev.filter(col("event_type") === "purchase" && col("user_id") < 30)
      .join(big, Seq("user_id"), "left_semi")
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id"))
  }

  /** LONGEST ACTIVITY STREAK (gaps-and-islands over calendar days): the
    * engagement metric behind "7-day streak" badges. Distinct active days
    * per user, islands via the day-number − row_number anchor (consecutive
    * days share an anchor), island length by count, best per user. Every
    * window and aggregate is keyed on user_id — the event log shuffles
    * once and no global ordering ever materializes; per-user day counts
    * are calendar-bounded so no partition can exceed ~days-of-history. */
  val qLongestStreak: Q = Q(
    "q179_longest_streak",
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
      |n AS (SELECT user_id, CAST(d - DATE '1970-01-01' AS BIGINT) AS dn FROM d),
      |g AS (SELECT user_id, dn,
      |        dn - row_number() OVER (PARTITION BY user_id ORDER BY dn) AS grp
      |      FROM n),
      |s AS (SELECT user_id, CAST(count(*) AS BIGINT) AS len
      |      FROM g GROUP BY user_id, grp)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS best_streak,
      |       CAST(count(*) AS BIGINT) AS n_streaks
      |FROM s GROUP BY user_id
      |ORDER BY best_streak DESC, user_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .select(col("user_id"),
        datediff(col("d"), lit("1970-01-01")).cast("long").as("dn"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("dn"))
    val streaks = days.withColumn("grp", col("dn") - row_number().over(w))
      .groupBy(col("user_id"), col("grp")).agg(count(lit(1)).as("len"))
    streaks.groupBy(col("user_id"))
      .agg(max(col("len")).as("best_streak"), count(lit(1)).as("n_streaks"))
      .orderBy(desc("best_streak"), col("user_id")).limit(20)
      .orderBy(desc("best_streak"), col("user_id"))
  }

  val all: Seq[Q] = Seq(qFunnel, qRetention, qTimeToConvert, qTransitions,
    qRollingWau, qAttribution, qProfile, qScd2, qActivityBitmap,
    qLtvCurve, qTopPaths, qSessionStats, qShareOfTotal, qRfm,
    qGrowthAccounting, qExpectations, qPitFeatures, qGroupFilter,
    qLongestStreak)
}
