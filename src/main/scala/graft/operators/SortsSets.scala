package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Sorts / limits / top-k and set operations (SURVEY.md §2.2).
  *
  * Top-k goes through Catalyst's `TakeOrderedAndProject` (per-partition
  * top-k + merge — the same distributed algorithm dask `nlargest` runs,
  * no global sort materialized). Set ops are first-class in Spark where
  * dask needs merge idioms.
  *
  * Reference capability: dask sort_values/nlargest/concat/drop_duplicates via the deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object SortsSets {

  /** Global sort + limit (dask `nlargest`): top-15 orders by price. */
  val qTopK: Q = Q(
    "q27_topk_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
      .limit(15)
  }

  /** Multi-key global sort with mixed directions (dask `sort_values`),
    * restricted to a selective slice so the full ordering is exercised. */
  val qMultiSort: Q = Q(
    "q28_multikey_sort",
    """SELECT o_orderpriority, o_orderdate, o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 450000
      |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_totalprice") > 450000)
      .select("o_orderpriority", "o_orderdate", "o_orderkey", "o_totalprice")
      .orderBy(col("o_orderpriority"), desc("o_totalprice"), col("o_orderkey"))
  }

  /** Union-all with schema alignment (dask `dd.concat`): urgent orders ∪
    * high-value orders, tagged by source branch. */
  val qUnionAll: Q = Q(
    "q29_union_all",
    """SELECT src, count(*) AS n, round(sum(o_totalprice), 2) AS total FROM (
      |  SELECT 'urgent' AS src, o_orderkey, o_totalprice FROM orders
      |  WHERE o_orderpriority = '1-URGENT'
      |  UNION ALL
      |  SELECT 'bigval' AS src, o_orderkey, o_totalprice FROM orders
      |  WHERE o_totalprice > 400000
      |) u GROUP BY src ORDER BY src""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(lit("urgent").as("src"), col("o_orderkey"), col("o_totalprice"))
    val bigval = o.filter(col("o_totalprice") > 400000)
      .select(lit("bigval").as("src"), col("o_orderkey"), col("o_totalprice"))
    urgent.unionByName(bigval)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("src"))
  }

  /** INTERSECT (dask semi-merge idiom): nations having both customers and
    * suppliers. */
  val qIntersect: Q = Q(
    "q30_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))
  }

  /** EXCEPT (dask anti-merge idiom): customers that ordered, minus
    * customers with 2+ orders → customers with exactly one order. */
  val qExcept: Q = Q(
    "q31_except",
    """SELECT o_custkey AS custkey FROM orders
      |EXCEPT
      |SELECT o_custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 2
      |ORDER BY custkey""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    o.select(col("o_custkey").as("custkey"))
      .except(o.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2).select(col("o_custkey").as("custkey")))
      .orderBy(col("custkey"))
  }

  /** DISTINCT projection (dask `drop_duplicates(subset)` on a projection —
    * the deterministic form; keep-first is done with min_by/row_number,
    * see q33). */
  val qDistinct: Q = Q(
    "q32_distinct_projection",
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin
  ) { (s, d) =>
    Tables.customer(s, d).select("c_nationkey", "c_mktsegment")
      .dropDuplicates()
      .orderBy(col("c_nationkey"), col("c_mktsegment"))
  }

  /** Deterministic keep-first dedup (dask `drop_duplicates(keep='first')`
    * over a sorted frame): first order per (custkey, orderpriority). */
  val qKeepFirst: Q = Q(
    "q33_dedup_keep_first",
    """SELECT o_custkey, o_orderpriority, o_orderkey AS first_orderkey
      |FROM (SELECT o_custkey, o_orderpriority, o_orderkey,
      |        row_number() OVER (PARTITION BY o_custkey, o_orderpriority
      |          ORDER BY o_orderdate, o_orderkey) AS rn
      |      FROM orders WHERE o_custkey <= 200) t
      |WHERE rn = 1
      |ORDER BY o_custkey, o_orderpriority""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 200)
      .groupBy(col("o_custkey"), col("o_orderpriority"))
      .agg(min_by(col("o_orderkey"),
        struct(col("o_orderdate"), col("o_orderkey"))).as("first_orderkey"))
      .orderBy(col("o_custkey"), col("o_orderpriority"))
  }

  /** Bernoulli sample (dask `df.sample(frac=)`): the seeded draw is
    * engine-specific, so the sampled COUNT can't hash-match DuckDB —
    * but the binomial contract can (r8 directive #6): the registered
    * form emits the exact table total plus a flag pinning the realized
    * count inside [0.005, 0.015]·n (expected 0.01·n; the band is >10σ
    * at the sf0.01 verify scale, and the seeded draw is deterministic
    * for fixed data, so the flag is stable). ScalaTest keeps the
    * tighter per-run fraction bound. */
  val qSample: Q = Q(
    "q34_sample",
    """SELECT CAST(count(*) AS BIGINT) AS n_total, true AS sample_in_bounds
      |FROM lineitem""".stripMargin
  ) { (s, d) =>
    val base = Tables.lineitem(s, d)
    val tot = base.agg(count(lit(1)).as("n_total"))
    val sm = base.sample(withReplacement = false, 0.01, seed = 42)
      .agg(count(lit(1)).as("n_s"))
    tot.crossJoin(broadcast(sm))
      .select(col("n_total"),
        (col("n_s") >= col("n_total") * lit(0.005) &&
          col("n_s") <= col("n_total") * lit(0.015)).as("sample_in_bounds"))
  }

  /** Stratified sample (dask/pandas `groupby.sample` / Spark `sampleBy`):
    * per-stratum Bernoulli fractions — the class-balancing shape a
    * training-data pipeline uses to downsample dominant classes. The
    * seeded draws are engine-specific, so realized counts can't hash-
    * match DuckDB — but each stratum's binomial contract can (r8
    * directive #6): the registered form emits per-stratum exact totals
    * and target fractions plus a flag pinning the realized fraction
    * inside [0.6f, 1.4f] (exactly f for the keep-all strata: Spark's
    * f≥1.0 path is a pass-through, no draw). ScalaTest keeps the
    * tighter per-stratum bound. */
  val qStratifiedSample: Q = Q(
    "q94_stratified_sample",
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_stratum,
      |       CAST(CASE event_type WHEN 'purchase' THEN 0.5
      |            WHEN 'signup' THEN 1.0 WHEN 'error' THEN 1.0
      |            ELSE 0.05 END AS DOUBLE) AS target_frac,
      |       true AS frac_in_bounds
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    val fractions = Map("click" -> 0.05, "view" -> 0.05, "purchase" -> 0.5,
      "signup" -> 1.0, "error" -> 1.0)
    val ev = Tables.events(s, d)
    val sampled = ev.stat.sampleBy("event_type", fractions, 42L)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_s"))
    val frac = element_at(typedLit(fractions), col("event_type"))
    // Binomial band derived from stratum size: |n_s − n·f| ≤ 5·σ where
    // σ = sqrt(n·f·(1−f)) — ~5-sigma for every stratum regardless of f,
    // so a fixture regeneration can't plausibly flip the flag (unlike a
    // fixed ±40% band, which is only ~2σ for the f=0.05 strata at sf0.01).
    val sigma = sqrt(col("n_stratum") * frac * (lit(1.0) - frac))
    ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_stratum"))
      .join(sampled, Seq("event_type"), "left")
      .select(col("event_type"), col("n_stratum"),
        frac.as("target_frac"),
        when(frac >= 1.0, col("n_s") === col("n_stratum"))
          .otherwise(
            abs(col("n_s") - col("n_stratum") * frac) <= sigma * 5.0)
          .as("frac_in_bounds"))
      .orderBy(col("event_type"))
  }

  /** Poisson sample (dask `df.sample(frac=, replace=True)`): with-
    * replacement draws are per-row Poisson(f) multiplicities, so the
    * realized count is Poisson(n·f) — engine-specific like q34, and
    * oracled the same way (r8 directive #6): exact total + a flag
    * pinning the realized count inside ±5·sqrt(n·f) of n·f (5σ for a
    * Poisson), plus the structural replacement invariant the
    * no-replacement path can't produce: distinct source rows ≤ drawn
    * rows (repeats allowed) and ≤ n. */
  val qSampleReplace: Q = Q(
    "q193_sample_replacement",
    """SELECT CAST(count(*) AS BIGINT) AS n_total, true AS sample_in_bounds,
      |       true AS distinct_le_drawn
      |FROM lineitem""".stripMargin
  ) { (s, d) =>
    val base = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"))
    val tot = base.agg(count(lit(1)).as("n_total"))
    val sm = base.sample(withReplacement = true, 0.01, seed = 42)
      .agg(count(lit(1)).as("n_s"),
        count_distinct(col("l_orderkey"), col("l_linenumber")).as("n_d"))
    tot.crossJoin(broadcast(sm))
      .select(col("n_total"),
        (abs(col("n_s") - col("n_total") * lit(0.01)) <=
          sqrt(col("n_total") * lit(0.01)) * 5.0).as("sample_in_bounds"),
        (col("n_d") <= col("n_s") && col("n_d") <= col("n_total"))
          .as("distinct_le_drawn"))
  }

  /** `df.tail(n)` (dask: last n rows of the final partition). Dask's tail
    * is positional; the deterministic Spark mapping pins the order by key:
    * last 10 orders by orderkey = sort-desc + limit (TakeOrderedAndProject,
    * no full sort, no single-partition stage) + re-sort ascending for
    * presentation. */
  val qTail: Q = Q(
    "q89_tail",
    """SELECT o_orderkey, o_custkey, o_totalprice FROM (
      |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |  ORDER BY o_orderkey DESC LIMIT 10
      |) t ORDER BY o_orderkey""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(desc("o_orderkey"))
      .limit(10)
      .orderBy(col("o_orderkey"))
  }

  /** Heterogeneous concat (dask `dd.concat` over frames with different
    * columns fills the gaps with nulls): orders-side rows carry price but
    * no balance, customer-side rows the reverse — `unionByName(
    * allowMissingColumns = true)` ≡ DuckDB `UNION ALL BY NAME`. */
  val qConcatByName: Q = Q(
    "q108_concat_by_name",
    """SELECT src, count(*) AS n,
      |  CAST(count(o_totalprice) AS BIGINT) AS n_price,
      |  CAST(count(c_acctbal) AS BIGINT) AS n_bal,
      |  round(coalesce(sum(o_totalprice), 0) + coalesce(sum(c_acctbal), 0), 2)
      |    AS total
      |FROM (
      |  SELECT 'ord' AS src, o_custkey AS k, o_totalprice FROM orders
      |  WHERE o_totalprice > 400000
      |  UNION ALL BY NAME
      |  SELECT 'cust' AS src, c_custkey AS k, c_acctbal FROM customer
      |  WHERE c_acctbal > 9000
      |) u GROUP BY src ORDER BY src""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .select(lit("ord").as("src"), col("o_custkey").as("k"), col("o_totalprice"))
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(lit("cust").as("src"), col("c_custkey").as("k"), col("c_acctbal"))
    o.unionByName(c, allowMissingColumns = true)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"),
        count(col("o_totalprice")).as("n_price"),
        count(col("c_acctbal")).as("n_bal"),
        round(coalesce(sum(col("o_totalprice")), lit(0))
          + coalesce(sum(col("c_acctbal")), lit(0)), 2).as("total"))
      .orderBy(col("src"))
  }

  /** pandas `duplicated(subset, keep=...)` — FLAG duplicates instead of
    * dropping them (the audit-trail form of q33's keep-first dedup):
    * dup_any = `keep=False` (every member of a >1 group), dup_first =
    * `keep='first'` (all but the first occurrence in doc_id order).
    * One shuffle on the subset key; both flags ride the same window
    * partition, so the second costs nothing extra. */
  val qDuplicatedFlag: Q = Q(
    "q111_duplicated_flag",
    """SELECT doc_id, (cnt > 1) AS dup_any, (rn > 1) AS dup_first
      |FROM (SELECT doc_id,
      |        count(*) OVER (PARTITION BY lang, n_chars) AS cnt,
      |        row_number() OVER (PARTITION BY lang, n_chars
      |          ORDER BY doc_id) AS rn
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val part = Window.partitionBy(col("lang"), col("n_chars"))
    val ord = part.orderBy(col("doc_id"))
    Tables.documents(s, d)
      .withColumn("cnt", count(lit(1)).over(part))
      .withColumn("rn", row_number().over(ord))
      .select(col("doc_id"), (col("cnt") > 1).as("dup_any"),
        (col("rn") > 1).as("dup_first"))
      .orderBy(col("doc_id"))
  }

  /** pandas `clip(lower, upper)` + `nsmallest(15)`: bound a column to a
    * range, then take the 15 smallest by the clipped value. The clip is
    * a pure scalar map (least/greatest, codegen'd); the nsmallest is an
    * ordered limit → TakeOrderedAndProject (per-partition heaps + driver
    * merge of 15-row partials), never a global sort. Ties on the clipped
    * floor break by (l_orderkey, l_linenumber), so the cut is
    * deterministic in both engines. */
  val qClipNsmallest: Q = Q(
    "q127_clip_nsmallest",
    """SELECT l_orderkey, l_linenumber,
      |  round(least(greatest(l_extendedprice, 5000.0), 50000.0), 2) AS clipped
      |FROM lineitem
      |ORDER BY clipped, l_orderkey, l_linenumber LIMIT 15""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(least(greatest(col("l_extendedprice"), lit(5000.0)), lit(50000.0)), 2)
          .as("clipped"))
      .orderBy(col("clipped"), col("l_orderkey"), col("l_linenumber"))
      .limit(15)
  }

  /** pandas `groupby.nth(2)` (0-indexed): the third order per customer
    * in (o_orderdate, o_orderkey) order. One partitioned window — the
    * groupBy key is the partition key, so rows never leave their
    * reducer — then a rank-equality filter. Customers with fewer than
    * three orders drop out, matching pandas nth semantics. */
  val qNthPerGroup: Q = Q(
    "q128_nth_per_group",
    """SELECT o_custkey, o_orderkey AS nth_orderkey, o_totalprice AS nth_price
      |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS rn FROM orders)
      |WHERE rn = 3 ORDER BY o_custkey""".stripMargin
  ) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 3)
      .select(col("o_custkey"), col("o_orderkey").as("nth_orderkey"),
        col("o_totalprice").as("nth_price"))
      .orderBy(col("o_custkey"))
  }

  val all: Seq[Q] = Seq(qTopK, qMultiSort, qUnionAll, qIntersect, qExcept,
    qDistinct, qKeepFirst, qSample, qStratifiedSample, qSampleReplace,
    qTail, qConcatByName,
    qDuplicatedFlag, qClipNsmallest, qNthPerGroup)
}
