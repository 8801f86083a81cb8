package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Join matrix (SURVEY.md §2.2 "Joins"): every `dd.merge` regime the
  * deployed dask library supports, re-expressed as Spark joins.
  *
  * Scale posture: dimension tables (region 5 / nation 25 / supplier ≤1k)
  * are explicitly `broadcast()` so the plan is a map-side join with no
  * shuffle of the fact table; big-big joins (orders⋈lineitem) shuffle on
  * the join key and rely on AQE for skew handling at 100 TB.
  */
object Joins {

  /** Shuffle join: customer⋈orders⋈lineitem revenue top-10 (TPC-H Q3 shape).
    * Reference capability: dask `dd.merge` large-large → shuffle hash join
    * (SURVEY §2.2; deployed lib per dask_ssh_docker/__init__.py:307). */
  val q3ShippingPriority: Q = Q(
    "q3_join3_revenue_top10",
    """SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |             JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15'
      |  AND l_shipdate > TIMESTAMP '1996-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-03-15").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  /** Broadcast dimension chain: customer→nation→region rollup of account
    * balances. Dask regime: merge with small side → map-side join. */
  val qBroadcastDims: Q = Q(
    "q4_broadcast_dim_join",
    """SELECT r_name, n_name, count(*) AS n_customers,
      |       round(sum(c_acctbal), 2) AS total_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |              JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left outer join with null-producing right side: orders with/without
    * any high-quantity lineitem. */
  val qLeftOuter: Q = Q(
    "q5_left_outer_join",
    """SELECT o_orderstatus,
      |       count(*) AS n_orders,
      |       count(l_orderkey) AS n_with_bigqty,
      |       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without
      |FROM orders LEFT JOIN (
      |  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49
      |) big ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey")).distinct()
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("l_orderkey")).as("n_with_bigqty"),
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_without"))
      .orderBy(col("o_orderstatus"))
  }

  /** Full outer join over two aggregates keyed differently populated:
    * per-nation customer count ⋈ per-nation supplier count. */
  val qFullOuter: Q = Q(
    "q6_full_outer_join",
    """SELECT coalesce(c.k, s.k) AS nationkey,
      |       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.k = s.k
      |ORDER BY nationkey""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
      .agg(count(lit(1)).as("n_cust"))
    val su = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(su, col("ck") === col("sk"), "full")
      .select(coalesce(col("ck"), col("sk")).as("nationkey"),
        coalesce(col("n_cust"), lit(0)).as("n_cust"),
        coalesce(col("n_supp"), lit(0)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Existence joins: left_semi / left_anti are first-class in Spark
    * (dask idiom: isin-on-keys / indicator filter). Customers that placed
    * at least one urgent order but never a low-priority one. */
  val qSemiAnti: Q = Q(
    "q7_semi_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW')
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(low, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Cross join + theta filter (dask `how='cross'` / key=constant regime):
    * region × nation pairs where the nation is NOT in the region. */
  val qCrossTheta: Q = Q(
    "q8_cross_theta_join",
    """SELECT r_name, count(*) AS n_foreign_nations
      |FROM region CROSS JOIN nation
      |WHERE r_regionkey <> n_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin
  ) { (s, d) =>
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .filter(col("r_regionkey") =!= col("n_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_foreign_nations"))
      .orderBy(col("r_name"))
  }

  /** Self-join on a fact table: pairs of lineitems of the same order shipped
    * the same day (band/equi self-join; dask merge on self). */
  val qSelfJoin: Q = Q(
    "q9_self_join_sameday",
    """SELECT a.l_orderkey, count(*) AS n_sameday_pairs
      |FROM lineitem a JOIN lineitem b
      |  ON a.l_orderkey = b.l_orderkey AND a.l_shipdate = b.l_shipdate
      | AND a.l_linenumber < b.l_linenumber
      |GROUP BY a.l_orderkey
      |ORDER BY n_sameday_pairs DESC, a.l_orderkey""".stripMargin
  ) { (s, d) =>
    val l = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_shipdate")
    val a = l.alias("a")
    val b = l.alias("b")
    a.join(b,
        col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_shipdate") === col("b.l_shipdate") &&
        col("a.l_linenumber") < col("b.l_linenumber"))
      .groupBy(col("a.l_orderkey"))
      .agg(count(lit(1)).as("n_sameday_pairs"))
      .orderBy(desc("n_sameday_pairs"), col("a.l_orderkey"))
  }

  /** Right outer join (dask `how='right'`): q5's shape with the sides
    * swapped — the null-producing side is now the LEFT input, preserved
    * rows come from the right. Exercises Spark's `"right"` join type
    * literally (the optimizer is free to flip it back to a left join;
    * semantics are what the oracle checks). */
  val qRightOuter: Q = Q(
    "q88_right_outer_join",
    """SELECT o_orderstatus,
      |       count(*) AS n_orders,
      |       count(l_orderkey) AS n_with_bigqty,
      |       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without
      |FROM (
      |  SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 49
      |) big RIGHT JOIN orders ON o_orderkey = l_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  ) { (s, d) =>
    val big = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey")).distinct()
    big.join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"), "right")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        count(col("l_orderkey")).as("n_with_bigqty"),
        sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_without"))
      .orderBy(col("o_orderstatus"))
  }

  /** `combine_first` (dask/pandas): fill one frame's missing values from
    * another, keeping all keys from both — a full outer join on the key
    * with per-column coalesce(primary, fallback). Nulls injected
    * deterministically; keys 101-120 exist only in the fallback frame, so
    * the outer side is exercised too. */
  val qCombineFirst: Q = Q(
    "q98_combine_first",
    """WITH prim AS (
      |  SELECT c_custkey, CASE WHEN c_custkey % 3 = 0 THEN NULL
      |                         ELSE c_acctbal END AS bal,
      |         c_mktsegment AS seg
      |  FROM customer WHERE c_custkey <= 100),
      |fb AS (SELECT c_custkey, round(c_acctbal, 0) AS bal, 'FALLBACK' AS seg
      |       FROM customer WHERE c_custkey <= 120)
      |SELECT coalesce(prim.c_custkey, fb.c_custkey) AS c_custkey,
      |       round(coalesce(prim.bal, fb.bal), 2) AS bal,
      |       coalesce(prim.seg, fb.seg) AS seg
      |FROM prim FULL OUTER JOIN fb ON prim.c_custkey = fb.c_custkey
      |ORDER BY c_custkey""".stripMargin
  ) { (s, d) =>
    val c = Tables.customer(s, d)
    val prim = c.filter(col("c_custkey") <= 100)
      .select(col("c_custkey"),
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_acctbal"))
          .as("bal"),
        col("c_mktsegment").as("seg"))
    val fb = c.filter(col("c_custkey") <= 120)
      .select(col("c_custkey"), round(col("c_acctbal"), 0).as("bal"),
        lit("FALLBACK").as("seg"))
    prim.as("p").join(fb.as("f"), col("p.c_custkey") === col("f.c_custkey"), "full_outer")
      .select(
        coalesce(col("p.c_custkey"), col("f.c_custkey")).as("c_custkey"),
        round(coalesce(col("p.bal"), col("f.bal")), 2).as("bal"),
        coalesce(col("p.seg"), col("f.seg")).as("seg"))
      .orderBy(col("c_custkey"))
  }

  /** Merge indicator (pandas/dask `merge(indicator=True)`): full outer
    * join with a provenance column saying which side(s) each key came
    * from. The id-range filters force all three classes to appear
    * (every customer has orders in the fixture, so an unfiltered join
    * would be all 'both'). Summarized per class so the output is stable
    * across scales. */
  val qMergeIndicator: Q = Q(
    "q101_merge_indicator",
    """WITH l AS (SELECT c_custkey AS k FROM customer WHERE c_custkey < 800),
      |r AS (SELECT DISTINCT o_custkey AS k FROM orders
      |      WHERE o_custkey >= 400 AND o_custkey < 1200)
      |SELECT CASE WHEN l.k IS NULL THEN 'right_only'
      |            WHEN r.k IS NULL THEN 'left_only'
      |            ELSE 'both' END AS merge_ind,
      |       CAST(count(*) AS BIGINT) AS n,
      |       min(coalesce(l.k, r.k)) AS min_key,
      |       max(coalesce(l.k, r.k)) AS max_key
      |FROM l FULL JOIN r ON l.k = r.k
      |GROUP BY merge_ind ORDER BY merge_ind""".stripMargin
  ) { (s, d) =>
    val l = Tables.customer(s, d).filter(col("c_custkey") < 800)
      .select(col("c_custkey").as("lk"))
    val r = Tables.orders(s, d)
      .filter(col("o_custkey") >= 400 && col("o_custkey") < 1200)
      .select(col("o_custkey").as("rk")).distinct()
    l.join(r, col("lk") === col("rk"), "full_outer")
      .select(
        when(col("lk").isNull, "right_only")
          .when(col("rk").isNull, "left_only")
          .otherwise("both").as("merge_ind"),
        coalesce(col("lk"), col("rk")).as("k"))
      .groupBy(col("merge_ind"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
      .orderBy(col("merge_ind"))
  }

  /** pandas `merge(validate='1:1'|'1:m'|'m:1')`: an IN-PLAN join-key
    * cardinality assertion. The claimed-unique side gets a per-key count
    * window and an `assert_true(count <= 1)` FILTER condition — the
    * filter keeps every valid row (assert_true yields null on success)
    * but the job fails loudly on the first duplicate key, instead of
    * silently fanning out rows the way an unvalidated merge does. Scale:
    * the count window shuffles on exactly the join keys — the same
    * partitioning the join itself needs, so AQE/exchange-reuse can
    * coalesce them; no extra pass over the data.
    *
    * Reference capability: pandas merge-validate carried by the deployed
    * dask dataframe layer (dask_ssh_docker/__init__.py:307). */
  def validateUnique(df: org.apache.spark.sql.DataFrame,
      keys: Seq[String], side: String): org.apache.spark.sql.DataFrame = {
    // the helper column must not collide with a caller column (withColumn
    // silently REPLACES an existing name, corrupting the output): pick
    // the first _val_cnt{,2,3,…} absent from the frame.
    val cnt = Iterator.from(1)
      .map(i => if (i == 1) "_val_cnt" else s"_val_cnt$i")
      .find(n => !df.columns.contains(n)).get
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
    df.withColumn(cnt, count(lit(1)).over(w))
      .filter(assert_true(col(cnt) <= 1,
        concat(lit(s"merge validate failed: $side side has duplicate key ("),
          concat_ws(",", keys.map(c => col(c).cast("string")): _*),
          lit(")"))).isNull)
      .drop(cnt)
  }

  /** `mergeValidated(left, right, keys, how, validate)`: the pandas
    * merge-validate surface. "1:1" asserts both sides unique, "1:m" the
    * left, "m:1" the right; "m:m" is a plain join. */
  def mergeValidated(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame, keys: Seq[String],
      how: String = "inner", validate: String = "m:m")
      : org.apache.spark.sql.DataFrame = {
    val l = if (validate == "1:1" || validate == "1:m")
      validateUnique(left, keys, "left") else left
    val r = if (validate == "1:1" || validate == "m:1")
      validateUnique(right, keys, "right") else right
    l.join(r, keys, how)
  }

  /** Interval-overlap join (the genomic/temporal "overlap" family —
    * distinct from q25's point-in-range and q46's as-of): pairs of
    * (purchase, click) events of the SAME user whose ±6h windows
    * overlap, i.e. |p.ts − c.ts| ≤ 6h. Scale shape: NEVER the naive
    * theta join (which degenerates to a per-user cross product) —
    * instead the classic band join: bucket each event into
    * floor(epoch/W) bands, explode the left side into its three
    * adjacent bands (b−1, b, b+1), equi-join on (user, band), then
    * apply the exact timestamp predicate. Every candidate pair meets in
    * EXACTLY one band (the right side keeps its single home band), so
    * no dedup pass is needed, and the shuffle is a plain equi-join
    * partitioned by (user, band) — each reducer sees one band's
    * worth, never a user's whole history. Bands use fractional epoch
    * seconds (fixture timestamps carry sub-second parts); the overlap
    * test itself stays in timestamp arithmetic, µs-exact in both
    * engines. */
  val qIntervalOverlap: Q = Q(
    "q136_interval_overlap_join",
    """SELECT p.user_id, CAST(count(*) AS BIGINT) AS n_overlaps
      |FROM events p JOIN events c ON p.user_id = c.user_id
      |WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND p.ts <= c.ts + INTERVAL 6 HOUR
      |  AND c.ts <= p.ts + INTERVAL 6 HOUR
      |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin
  ) { (s, d) =>
    val w = 6 * 3600 // band width = the overlap tolerance, in seconds
    val ev = Tables.events(s, d)
    def banded(tpe: String, idOut: String, tsOut: String) =
      ev.filter(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as(idOut), col("ts").as(tsOut),
          floor(col("ts").cast("double") / w).cast("long").as("b0"))
    val p = banded("purchase", "a_id", "a_ts")
      .select(col("user_id"), col("a_id"), col("a_ts"),
        explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("band"))
    val c = banded("click", "b_id", "b_ts")
      .withColumnRenamed("b0", "band")
    p.join(c, Seq("user_id", "band"))
      .filter(col("a_ts") <= col("b_ts") + expr("INTERVAL 6 HOURS") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 6 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_overlaps"))
      .orderBy(col("user_id"))
  }

  /** Snapshot diff / change capture (pandas `DataFrame.compare` + the
    * SCD audit between two corpus versions — "what changed since the
    * last crawl"): a key-aligned FULL OUTER join classifying every key
    * as unchanged / modified / added / deleted. One shuffle on the key
    * for both sides; the value comparison is null-safe so a missing
    * side never reads as a change of value. The "new" snapshot is
    * derived deterministically from the fixture (drop every 97th id,
    * add 1.0 to every 101st) so the oracle replays it exactly —
    * exact-dollar arithmetic, no float rounding at the compare
    * boundary. */
  val qSnapshotDiff: Q = Q(
    "q142_snapshot_diff",
    """WITH old AS (SELECT event_id, value FROM events),
      |new AS (SELECT event_id,
      |          CASE WHEN event_id % 101 = 0 THEN value + 1.0 ELSE value END AS value
      |        FROM events WHERE event_id % 97 <> 0
      |        UNION ALL
      |        SELECT event_id + 20000000, value FROM events WHERE event_id % 103 = 0),
      |j AS (SELECT coalesce(old.event_id, new.event_id) AS k,
      |        old.event_id AS ok, new.event_id AS nk,
      |        old.value AS ov, new.value AS nv
      |      FROM old FULL OUTER JOIN new ON old.event_id = new.event_id),
      |c AS (SELECT k,
      |        CASE WHEN ok IS NULL THEN 'added'
      |             WHEN nk IS NULL THEN 'deleted'
      |             WHEN ov = nv THEN 'unchanged'
      |             ELSE 'modified' END AS change
      |      FROM j)
      |SELECT change, CAST(count(*) AS BIGINT) AS n,
      |       min(k) AS min_id, max(k) AS max_id
      |FROM c GROUP BY change ORDER BY change""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
    val old = ev.select(col("event_id"), col("value"))
    val nw = ev.filter(col("event_id") % 97 =!= 0)
      .select(col("event_id"),
        when(col("event_id") % 101 === 0, col("value") + 1.0)
          .otherwise(col("value")).as("value"))
      .union(ev.filter(col("event_id") % 103 === 0)
        .select((col("event_id") + 20000000L).as("event_id"), col("value")))
    val j = old.select(col("event_id").as("ok"), col("value").as("ov"))
      .join(nw.select(col("event_id").as("nk"), col("value").as("nv")),
        col("ok") === col("nk"), "full_outer")
    j.select(coalesce(col("ok"), col("nk")).as("k"),
        when(col("ok").isNull, "added")
          .when(col("nk").isNull, "deleted")
          .when(col("ov") === col("nv"), "unchanged")
          .otherwise("modified").as("change"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), min(col("k")).as("min_id"),
        max(col("k")).as("max_id"))
      .orderBy(col("change"))
  }

  /** Delete-request cascade (the GDPR/right-to-be-forgotten propagation
    * audit a data platform runs before a purge): a deleted-customer set
    * cascades customer → orders → lineitem, and the output is the
    * per-table before/after/purged ledger the compliance job logs.
    * Shape: each stage is an anti/semi join against the DISTINCT key set
    * of the previous stage (deleted custkeys gate orders; the affected
    * ORDERKEY set — unique by construction — gates lineitem), so every
    * build side is a bounded key list the planner can broadcast, and no
    * fact table is scanned more than twice (once to count, once to
    * classify). */
  val qDeleteCascade: Q = Q(
    "q172_delete_cascade",
    """WITH del AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
      |do_ AS (SELECT o_orderkey FROM orders
      |        WHERE o_custkey IN (SELECT c_custkey FROM del)),
      |c AS (SELECT 'customer' AS tbl,
      |        (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_before,
      |        (SELECT CAST(count(*) AS BIGINT) FROM del) AS n_purged),
      |o AS (SELECT 'orders' AS tbl,
      |        (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_before,
      |        (SELECT CAST(count(*) AS BIGINT) FROM do_) AS n_purged),
      |l AS (SELECT 'lineitem' AS tbl,
      |        (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_before,
      |        (SELECT CAST(count(*) AS BIGINT) FROM lineitem
      |         WHERE l_orderkey IN (SELECT o_orderkey FROM do_)) AS n_purged)
      |SELECT tbl, n_before, n_purged, n_before - n_purged AS n_after
      |FROM (SELECT * FROM c UNION ALL SELECT * FROM o
      |      UNION ALL SELECT * FROM l)
      |ORDER BY tbl""".stripMargin
  ) { (s, d) =>
    val cust = Tables.customer(s, d)
    val ords = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val del = cust.filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
    val delOrders = ords.join(broadcast(del),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
    def ledger(tbl: String, all: org.apache.spark.sql.DataFrame,
        purged: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      all.agg(count(lit(1)).as("n_before"))
        .crossJoin(broadcast(purged.agg(count(lit(1)).as("n_purged"))))
        .select(lit(tbl).as("tbl"), col("n_before"), col("n_purged"),
          (col("n_before") - col("n_purged")).as("n_after"))
    val delLine = li.join(broadcast(delOrders),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    ledger("customer", cust, del)
      .unionByName(ledger("orders", ords, delOrders))
      .unionByName(ledger("lineitem", li, delLine))
      .orderBy(col("tbl"))
  }

  /** TPC-H Q5-shaped SIX-way join (local-supplier revenue by nation):
    * the multi-join workload Catalyst's join reordering + broadcast
    * selection exists for. The plan the optimizer should pick — and
    * the fixture plan shows — is: region⋈nation⋈customer/supplier as
    * BROADCAST dims (region prunes nations before anything big moves),
    * the orders date filter PUSHED to the parquet scan, and only the
    * two fact joins (orders⋈customer, lineitem⋈orders) shuffling. The
    * co-location predicate c_nationkey = s_nationkey rides the supplier
    * join, never a standalone theta. */
  val qLocalSupplierRevenue: Q = Q(
    "q175_local_supplier_revenue",
    """SELECT n_name,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin
  ) { (s, d) =>
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(rev), 2).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  /** MARKET-BASKET PAIR COUNTS (co-occurrence mining, the A-priori first
    * pass): parts purchased together in the same order. The pair space
    * never materializes globally: orders collapse to per-basket part
    * SETS (`collect_set` — partial aggregation dedups map-side, one
    * shuffle on l_orderkey), then the ordered pairs expand INSIDE each
    * basket row with codegen'd array higher-order functions — sort the
    * set once, pair each element with its strict suffix, so `pa < pb`
    * holds by construction and fan-out is bounded by (basket size)²
    * (TPC-H baskets are ≤ 7 lines; a 100 TB pipeline with pathological
    * baskets adds a `slice` cap on the sorted array first). Counts then
    * hash-aggregate on the pair key with map-side combine. The r7 form
    * self-joined a distinct item list — same semantics, but 3 exchanges
    * and a double scan where this takes 2 and one. */
  val qMarketBasket: Q = Q(
    "q180_market_basket",
    """WITH i AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |p AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      |      FROM i a JOIN i b ON a.l_orderkey = b.l_orderkey
      |       AND a.l_partkey < b.l_partkey)
      |SELECT pa, pb, CAST(count(*) AS BIGINT) AS n_baskets
      |FROM p GROUP BY pa, pb
      |ORDER BY n_baskets DESC, pa, pb LIMIT 20""".stripMargin
  ) { (s, d) =>
    val baskets = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("parts"))
    val pairs = baskets.select(explode(flatten(transform(col("parts"),
      (x, i) => transform(
        slice(col("parts"), i + lit(2), size(col("parts"))),
        y => struct(x.as("pa"), y.as("pb")))))).as("p"))
    pairs.select(col("p.pa"), col("p.pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n_baskets"))
      .orderBy(desc("n_baskets"), col("pa"), col("pb")).limit(20)
  }

  /** SCD TYPE-1 UPSERT (apply a changelog to a snapshot — the warehouse
    * MERGE INTO shape, and the complement of q153's SCD2 interval
    * build): base state = latest (value, ts) per (user, event_type)
    * from the history slice, delta = the same from the incoming slice;
    * the merge keeps delta where present, carries base otherwise, and
    * tags each key inserted / updated / carried. Both sides reduce to
    * key-grain BEFORE the full-outer join (windows partitioned by the
    * key, never global), so the join is state-sized, not event-sized —
    * at 100 TB the base side is yesterday's compacted state table and
    * only the delta rescans raw data. Tie-break on event_id makes
    * "latest" total, so the upsert is deterministic under equal
    * timestamps. Output is the per-change-type ledger; the hash compare
    * proves which keys each class captured and the merged values. */
  val qScd1Upsert: Q = Q(
    "q185_scd1_upsert",
    """WITH base AS (
      |  SELECT user_id, event_type, value, ts FROM (
      |    SELECT user_id, event_type, value, ts,
      |           row_number() OVER (PARTITION BY user_id, event_type
      |             ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE day(ts) <= 2) WHERE rn = 1),
      |delta AS (
      |  SELECT user_id, event_type, value, ts FROM (
      |    SELECT user_id, event_type, value, ts,
      |           row_number() OVER (PARTITION BY user_id, event_type
      |             ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM events WHERE day(ts) >= 3) WHERE rn = 1)
      |SELECT CASE WHEN d.user_id IS NULL THEN 'carried'
      |            WHEN b.user_id IS NULL THEN 'inserted'
      |            ELSE 'updated' END AS change,
      |       CAST(count(*) AS BIGINT) AS n_keys,
      |       round(sum(coalesce(d.value, b.value)), 2) AS total_value,
      |       max(coalesce(d.ts, b.ts)) AS latest_ts
      |FROM base b FULL OUTER JOIN delta d
      |  ON b.user_id = d.user_id AND b.event_type = d.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    def latest(df: org.apache.spark.sql.DataFrame, pfx: String)
        : org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(desc("ts"), desc("event_id"))
      df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
        .select(col("user_id").as(s"${pfx}_uid"),
          col("event_type").as(s"${pfx}_et"),
          col("value").as(s"${pfx}_value"), col("ts").as(s"${pfx}_ts"))
    }
    val ev = Tables.events(s, d)
    val base = latest(ev.filter(dayofmonth(col("ts")) <= 2), "b")
    val delta = latest(ev.filter(dayofmonth(col("ts")) >= 3), "d")
    base.join(delta,
        col("b_uid") === col("d_uid") && col("b_et") === col("d_et"), "full_outer")
      .withColumn("change",
        when(col("d_uid").isNull, "carried")
          .when(col("b_uid").isNull, "inserted")
          .otherwise("updated"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n_keys"),
        round(sum(coalesce(col("d_value"), col("b_value"))), 2).as("total_value"),
        max(coalesce(col("d_ts"), col("b_ts"))).as("latest_ts"))
      .orderBy(col("change"))
  }

  val all: Seq[Q] = Seq(q3ShippingPriority, qBroadcastDims, qLeftOuter,
    qFullOuter, qSemiAnti, qCrossTheta, qSelfJoin, qRightOuter, qCombineFirst,
    qMergeIndicator, qIntervalOverlap, qSnapshotDiff, qDeleteCascade,
    qLocalSupplierRevenue, qMarketBasket, qScd1Upsert)
}
