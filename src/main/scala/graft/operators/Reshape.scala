package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Reshaping + set-semantics completions (SURVEY.md §2.2): melt/unpivot
  * (dask `dd.melt`), arbitrary GROUPING SETS (SQL-only in the DataFrame
  * world), and multiset EXCEPT ALL / INTERSECT ALL.
  *
  * Reference capability: dask dd.melt and set-op merge idioms via the deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object Reshape {

  /** melt / unpivot (dask `dd.melt(id_vars, value_vars)`): wide metric
    * columns → long (metric, value) rows. Oracle reconstructs via
    * UNION ALL — the engine-portable definition of unpivot. */
  val qUnpivot: Q = Q(
    "q79_unpivot_melt",
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
      |  FROM lineitem WHERE l_orderkey < 100
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
      |  FROM lineitem WHERE l_orderkey < 100) u
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_orderkey") < 100)
      .unpivot(
        ids = Array(col("l_orderkey"), col("l_linenumber")),
        values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
        variableColumnName = "metric",
        valueColumnName = "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))
  }

  /** Arbitrary GROUPING SETS (beyond rollup/cube; Spark exposes it via
    * SQL): totals by segment, by priority, and grand total — but not the
    * cross. */
  val qGroupingSets: Q = Q(
    "q80_grouping_sets",
    """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
      |       coalesce(o_orderpriority, 'ALL') AS prio,
      |       count(*) AS n
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
      |ORDER BY seg, prio""".stripMargin
  ) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("graft_orders")
    Tables.customer(s, d).createOrReplaceTempView("graft_customer")
    s.sql(
      """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
        |       coalesce(o_orderpriority, 'ALL') AS prio,
        |       count(*) AS n
        |FROM graft_orders JOIN graft_customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment), (o_orderpriority), ())
        |ORDER BY seg, prio""".stripMargin)
  }

  /** Multiset semantics: EXCEPT ALL / INTERSECT ALL preserve
    * multiplicities (dask has only the merge-idiom approximations). */
  val qMultisetOps: Q = Q(
    "q81_multiset_except_intersect",
    """SELECT 'except_all' AS op, count(*) AS n FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |UNION ALL
      |SELECT 'intersect_all', count(*) FROM (
      |  SELECT o_custkey FROM orders WHERE o_totalprice > 100000
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |ORDER BY op""".stripMargin
  ) { (s, d) =>
    val o = Tables.orders(s, d)
    val big = o.filter(col("o_totalprice") > 100000).select("o_custkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val ex = big.exceptAll(urgent).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("n"))
    val in = big.intersectAll(urgent).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("n"))
    ex.unionByName(in).orderBy(col("op"))
  }

  /** explode_outer (pandas `.explode()` keeps empty-list rows as NaN):
    * docs keep a null-token row when they have no long tokens. Oracle
    * models outer semantics by substituting [NULL] for empty lists. */
  val qExplodeOuter: Q = Q(
    "q83_explode_outer",
    """SELECT doc_id, tok FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) AS tok
      |  FROM (SELECT doc_id,
      |          list_filter(string_split(text, ' '), x -> length(x) > 6) AS l
      |        FROM documents WHERE doc_id < 100))
      |ORDER BY doc_id, tok""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .withColumn("l", filter(split(col("text"), " "), x => length(x) > 6))
      .select(col("doc_id"), explode_outer(col("l")).as("tok"))
      .orderBy(col("doc_id"), col("tok"))
  }

  /** One-hot encoding (pandas/dask `get_dummies` — the categorical →
    * indicator-columns feature-engineering reshape). Indicator per
    * category value, all inside one codegen'd projection; at scale the
    * category list comes from a distinct-scan driven pivot (q14's shape)
    * when it isn't known statically. */
  val qOneHot: Q = Q(
    "q96_one_hot",
    """SELECT doc_id,
      |  CAST(lang = 'de' AS BIGINT) AS lang_de,
      |  CAST(lang = 'en' AS BIGINT) AS lang_en,
      |  CAST(lang = 'es' AS BIGINT) AS lang_es,
      |  CAST(lang = 'fr' AS BIGINT) AS lang_fr,
      |  CAST(lang = 'zh' AS BIGINT) AS lang_zh
      |FROM documents WHERE doc_id < 500 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val langs = Seq("de", "en", "es", "fr", "zh")
    Tables.documents(s, d).filter(col("doc_id") < 500)
      .select(col("doc_id") +:
        langs.map(l => (col("lang") === l).cast("long").as(s"lang_$l")): _*)
      .orderBy(col("doc_id"))
  }

  /** pandas `factorize` (categorical → dense integer codes, the ML
    * label-encoding step): codes 0..k−1 assigned in sort order via
    * Scale.globalDenseRank — a broadcast dictionary join, NOT an
    * unpartitioned window, so the encoding scales to high-cardinality
    * vocabularies (the dictionary is the only small side). */
  val qFactorize: Q = Q(
    "q116_factorize",
    """WITH codes AS (SELECT event_type,
      |    CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS code
      |  FROM (SELECT DISTINCT event_type FROM events) t)
      |SELECT e.event_id, e.event_type, c.code
      |FROM events e JOIN codes c USING (event_type)
      |WHERE e.event_id < 100 ORDER BY e.event_id""".stripMargin
  ) { (s, d) =>
    // dictionary from the FULL corpus (codes must not depend on which
    // slice is being encoded), then a broadcast join onto the slice
    val dict = Scale.globalDenseRank(
      Tables.events(s, d).select(col("event_type")).distinct(),
      col("event_type"), "rk")
    Tables.events(s, d).filter(col("event_id") < 100)
      .join(broadcast(dict), Seq("event_type"))
      .select(col("event_id"), col("event_type"),
        (col("rk") - 1).cast("long").as("code"))
      .orderBy(col("event_id"))
  }

  /** dask/pandas `df.categorize(columns)` — multi-column dictionary
    * encoding with a REUSABLE dictionary (known-categories semantics:
    * `astype(CategoricalDtype(categories=...))` applies one dictionary
    * to any frame; the deployed image's pandas surface, reference
    * `__init__.py:307`). One corpus scan stacks every categorical
    * column into (colname, value) pairs; distinct + a per-column
    * dense code in value order. The dictionary is bounded by total
    * vocabulary size — the only windowed frame — and application is a
    * broadcast join per column, so the fat frame never shuffles. */
  def buildDictionary(df: DataFrame, cats: Seq[String]): DataFrame = {
    val pairs = df.select(explode(array(cats.map(c =>
        struct(lit(c).as("colname"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.colname").as("colname"), col("p.value").as("value"))
      // NaN/null is NOT a category (pandas semantics): a null value
      // encodes as null code via the left join, never as a dict entry
      .filter(col("value").isNotNull)
      .distinct()
    // codes 0..k−1 per column in value sort order; the window partitions
    // by colname over the SMALL dict frame, never the corpus
    pairs.withColumn("code", (dense_rank().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("colname"))
          .orderBy(col("value"))) - 1).cast("long"))
  }

  /** Encode `cats` columns of ANY frame against a prebuilt dictionary
    * (appends `<col>_code`; values absent from the dictionary encode as
    * null — pandas' unknown-category NaN). Broadcast join per column. */
  def applyDictionary(df: DataFrame, dict: DataFrame, cats: Seq[String]): DataFrame =
    cats.foldLeft(df) { (acc, c) =>
      val d = dict.filter(col("colname") === c)
        .select(col("value").as(s"__cat_$c"), col("code").as(s"${c}_code"))
      acc.join(broadcast(d), acc(c).cast("string") === col(s"__cat_$c"), "left")
        .drop(s"__cat_$c")
    }

  /** The oracled demo: one dictionary over (lang, source) from the FULL
    * documents corpus, applied to TWO disjoint frames (the reuse
    * contract — codes must agree across frames because they come from
    * the shared dictionary, not per-frame ranks), results unioned. */
  val qCategorize: Q = Q(
    "q135_categorize",
    """WITH dl AS (SELECT lang AS value,
      |    CAST(dense_rank() OVER (ORDER BY lang) - 1 AS BIGINT) AS code
      |  FROM (SELECT DISTINCT lang FROM documents) t),
      |ds AS (SELECT source AS value,
      |    CAST(dense_rank() OVER (ORDER BY source) - 1 AS BIGINT) AS code
      |  FROM (SELECT DISTINCT source FROM documents) t)
      |SELECT d.doc_id, d.lang, dl.code AS lang_code,
      |       d.source, ds.code AS source_code
      |FROM documents d JOIN dl ON d.lang = dl.value
      |               JOIN ds ON d.source = ds.value
      |WHERE d.doc_id < 50 OR (d.doc_id >= 450 AND d.doc_id < 475)
      |ORDER BY d.doc_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val dict = buildDictionary(docs, Seq("lang", "source"))
    val sliceA = docs.filter(col("doc_id") < 50)
    val sliceB = docs.filter(col("doc_id") >= 450 && col("doc_id") < 475)
    // two separate frames encoded against ONE dictionary, then unioned
    Seq(sliceA, sliceB).map(sl =>
        applyDictionary(sl, dict, Seq("lang", "source"))
          .select(col("doc_id"), col("lang"), col("lang_code"),
            col("source"), col("source_code")))
      .reduce(_ union _)
      .orderBy(col("doc_id"))
  }

  /** pandas `pd.crosstab(lang, source)` — the contingency table via
    * Spark's dedicated `stat.crosstab` (zero-filled counts, one
    * pass + pivot). Output is |langs| × |sources| — bounded by category
    * cardinality, not corpus size, so the wide shape is safe at any
    * scale; high-cardinality axes belong in the long (groupBy) form. */
  val qCrosstab: Q = Q(
    "q137_crosstab", {
      val srcs = (0 until 20).map(i => s"src$i")
      val cols = srcs.map(sv =>
        s"CAST(sum(CASE WHEN source = '$sv' THEN 1 ELSE 0 END) AS BIGINT) AS $sv")
        .mkString(",\n  ")
      s"SELECT lang AS lang_source,\n  $cols\nFROM documents GROUP BY lang ORDER BY lang"
    }
  ) { (s, d) =>
    Tables.documents(s, d).stat.crosstab("lang", "source")
      .orderBy(col("lang_source"))
  }

  /** pandas `pd.cut` — FIXED-edge binning (q100's qcut is the
    * quantile-edge twin): order totals labeled by explicit price bands.
    * A codegen'd CASE chain, zero shuffle before the per-bin aggregate. */
  val qCutBins: Q = Q(
    "q138_cut_fixed_bins",
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'lo'
      |            WHEN o_totalprice < 150000 THEN 'mid'
      |            WHEN o_totalprice < 300000 THEN 'hi'
      |            ELSE 'vhi' END AS bin,
      |       CAST(count(*) AS BIGINT) AS n,
      |       round(avg(o_totalprice), 2) AS avg_price
      |FROM orders GROUP BY bin ORDER BY bin""".stripMargin
  ) { (s, d) =>
    val bin = when(col("o_totalprice") < 50000, "lo")
      .when(col("o_totalprice") < 150000, "mid")
      .when(col("o_totalprice") < 300000, "hi")
      .otherwise("vhi")
    Tables.orders(s, d)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("bin"))
  }

  /** pandas `df.explode(['toks', 'lens'])` — MULTI-column explode of
    * parallel arrays in lockstep (one output row per position, all
    * exploded columns aligned): `posexplode(arrays_zip(...))`. The zip
    * guarantees positional alignment that two independent explodes
    * would destroy. */
  val qExplodeMulti: Q = Q(
    "q139_explode_multi",
    """SELECT doc_id, CAST(i AS BIGINT) AS pos, ts[i + 1] AS tok,
      |       CAST(length(ts[i + 1]) AS BIGINT) AS tok_len
      |FROM (SELECT doc_id, string_split(text, ' ') AS ts,
      |        unnest(range(0, len(string_split(text, ' ')))) AS i
      |      FROM documents WHERE doc_id < 30)
      |ORDER BY doc_id, pos""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 30)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("lens", transform(col("toks"), t => length(t).cast("long")))
      .select(col("doc_id"),
        posexplode(arrays_zip(col("toks"), col("lens"))).as(Seq("pos", "z")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("z.toks").as("tok"), col("z.lens").as("tok_len"))
      .orderBy(col("doc_id"), col("pos"))
  }

  val all: Seq[Q] = Seq(qUnpivot, qGroupingSets, qMultisetOps, qExplodeOuter,
    qOneHot, qFactorize, qCategorize, qCrosstab, qCutBins, qExplodeMulti)
}
