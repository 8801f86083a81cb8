package graft.operators

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

  val all: Seq[Q] = Seq(qFunnel, qRetention, qTimeToConvert, qTransitions,
    qRollingWau, qAttribution)
}
