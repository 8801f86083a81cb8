package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew-handling operators (SURVEY.md §7.3 "100 TB posture"): salting
  * turns a skewed single-key aggregation/join into a two-phase shape
  * where no reducer sees a whole hot key. AQE's skew-join split covers
  * the join case automatically; explicit salt is the portable form and
  * the one that also works for aggregations with giant groups.
  *
  * Scale posture per SURVEY §7.3; the reference's only parallelism knob is the --nprocs passthrough (dask_ssh_docker/__init__.py:218-219, README.md:60).
  */
object Scale {

  val SaltBuckets = 16

  /** Release the cached blocks behind a localCheckpoint'd frame
    * (Dataset.unpersist only covers CacheManager entries, not
    * checkpoint RDDs). Caller contract: nothing may read the frame
    * again — its lineage is truncated, so dropped blocks cannot be
    * recomputed. The iterative operators (CC, k-means) call this on
    * each superseded round so a loop pins one round's state, not all
    * of them. */
  /** Pre-cut DISK_ONLY caches of LAZY reliable cuts, keyed by the cut
    * frame's root RDD id — unpersisted when the loop drops the
    * superseded round ([[dropCheckpoint]]) or at the end-of-query
    * [[releasePins]] backstop. See the lazy branch of [[cut]]. */
  private val lazyCutCaches =
    new java.util.concurrent.ConcurrentHashMap[Int, DataFrame]()

  private[operators] def dropCheckpoint(df: DataFrame): Unit =
    // ROOT match only: a derived (non-checkpointed) frame EMBEDS its
    // parents' LogicalRDD nodes, and a tree-wide drop would unpersist a
    // parent checkpoint other rounds still read. A checkpointed frame's
    // plan root IS the LogicalRDD; anything else is a no-op.
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
        val cached = lazyCutCaches.remove(l.rdd.id)
        if (cached != null) cached.unpersist(false)
      case _ => ()
    }

  /** Session conf key: when set (to an HDFS/S3/posix path), iterative
    * loops cut lineage via RELIABLE checkpoints in that directory
    * instead of `localCheckpoint`. */
  val CheckpointDirKey = "spark.graft.checkpoint.dir"

  /** The base dir most recently installed on the SparkContext by
    * [[cut]] (see the install logic there). */
  @volatile private var installedCkptBase: Option[String] = None

  /** Fresh checkpoint directory for the harness (Bench/Verify/Scratch).
    * Preference: $SPARK_GRAFT_CKPT_BASE, else /dev/shm (tmpfs) when
    * writable, else java.io.tmpdir. On a real cluster the reliable
    * checkpoint store (HDFS/S3) is a SEPARATE service from the data
    * volumes; locally, routing checkpoint writes to the same disk the
    * parquet fixtures live on adds kernel-writeback contention to
    * queries that never touch a checkpoint (r10 bench: alternating
    * slow passes in the name-sorted tail). tmpfs reproduces the
    * production separation while keeping the reliable-checkpoint code
    * path (file write + second job) intact. */
  def harnessCheckpointDir(): String = {
    val base = sys.env.get("SPARK_GRAFT_CKPT_BASE").filter(_.nonEmpty)
      .orElse(Some("/dev/shm").filter(p =>
        java.nio.file.Files.isWritable(java.nio.file.Paths.get(p))))
      .getOrElse(sys.props("java.io.tmpdir"))
    java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(base), "graft_ckpt")
      .toString
  }

  /** Delete every finished reliable-checkpoint payload (the `rdd-*`
    * dirs under the session's checkpoint dir). Harness hook, called
    * AFTER a sweep has released all cached/pinned frames: at that point
    * no live plan can read an old checkpoint, so an eager delete is
    * safe — and deterministic, unlike
    * `spark.cleaner.referenceTracking.cleanCheckpoints`, which only
    * fires when the JVM happens to GC the RDD reference (files — on a
    * tmpfs checkpoint dir, memory — accumulate until a late-run GC). */
  def reapCheckpoints(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getCheckpointDir.foreach { dir =>
      try {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p))
          fs.listStatus(p).iterator
            .filter(st => st.isDirectory && st.getPath.getName.startsWith("rdd-"))
            .foreach(st => fs.delete(st.getPath, true))
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Registry of operator-persisted frames that outlive their operator
    * (shared-frame persists: a self-join's both sides, a loop's final
    * assignment). The harness (Bench/Verify sweeps) releases them at
    * DATASET level via [[releasePins]] — an RDD-level sweep
    * (`sc.getPersistentRDDs` + `rdd.unpersist`) drops the blocks but
    * leaves the CacheManager ENTRY behind, so the next run of the same
    * query plan substitutes a stale InMemoryRelation whose storage
    * level was zeroed: every consumer then recomputes the full lineage
    * AND rebuilds columnar batches with no reuse (r10 bench: t54 warm
    * 1.57 s vs cold 1.09 s from exactly this — "Asked to cache already
    * cached data" warnings in the tail are its signature).
    *
    * CONTRACT (r10 advisory): the registry is process-global and
    * harness-scoped. Outside a sweeping harness (Bench/Verify/test
    * suites that call [[releasePins]] between queries), pinned frames
    * accumulate for the session lifetime — a long-lived library caller
    * must either call [[releasePins]] at its own batch boundaries or
    * unpersist the returned frames itself; and because release is
    * global, two concurrent in-JVM harness loops would release each
    * other's pins (run sweeps from one driver loop, which is how every
    * shipped harness uses it). The size warning in [[pin]] makes a
    * missing release visible instead of silent. */
  private val pins = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  private val PinWarnThreshold = 64
  private lazy val log = org.slf4j.LoggerFactory.getLogger("graft.Scale")

  /** Persist `df` and register it for harness release. Operators use
    * this for shared frames they never unpersist themselves; transient
    * persists that are dropped in-operator (a loop's superseded round)
    * stay direct `.persist`/`.unpersist` calls. */
  private[graft] def pin(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    pins.add(p)
    val n = pins.size()
    if (n > PinWarnThreshold && n % PinWarnThreshold == 1)
      log.warn(s"graft pin registry holds $n persisted frames — call " +
        "Scale.releasePins() at batch boundaries (see the pins contract)")
    p
  }

  /** Unpersist every pinned frame, blocking, Dataset-level (removes the
    * CacheManager entry AND its blocks — see [[pin]]). Idempotent:
    * unpersisting an already-released frame is a no-op. */
  def releasePins(): Unit = {
    // lazy-cut cache backstop first: a loop's FINAL round has no
    // dropCheckpoint call, so its pre-cut cache drains here
    val it = lazyCutCaches.values().iterator()
    while (it.hasNext) {
      try it.next().unpersist(blocking = true)
      catch { case scala.util.control.NonFatal(_) => () }
      it.remove()
    }
    var d = pins.poll()
    while (d != null) {
      try d.unpersist(blocking = true)
      catch { case scala.util.control.NonFatal(_) => () }
      d = pins.poll()
    }
  }

  /** Round-boundary lineage cut for the iterative operators (CC,
    * k-means). Default `localCheckpoint`: executor-storage-backed,
    * zero-config, right for local[*] — but lineage is truncated, so on
    * a real cluster losing an executor mid-loop kills the job. Setting
    * [[CheckpointDirKey]] switches every loop to reliable checkpoints
    * (files under the given dir, fault-tolerant). The dir is installed
    * once per SparkContext; set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` to reap
    * superseded round files on GC. */
  private[graft] def cut(df: DataFrame, eager: Boolean): DataFrame =
    df.sparkSession.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        // Track the installed BASE dir ourselves: sc.getCheckpointDir
        // returns the uuid SUBDIR setCheckpointDir created, so it can
        // never compare equal to the configured base — an is-empty
        // guard alone would silently keep writing into the first base
        // ever installed after a conf change (and makes any two suites
        // that configure different dirs order-dependent). The isEmpty
        // check below handles the OTHER stale case (r10 advisory): the
        // base-dir cache is process-global, so a FRESH SparkContext
        // created after a stop() in the same JVM has no checkpoint dir
        // even when the cached base matches — re-install then too.
        Scale.synchronized {
          if (!installedCkptBase.contains(dir) || sc.getCheckpointDir.isEmpty) {
            sc.setCheckpointDir(dir)
            installedCkptBase = Some(dir)
          }
        }
        // Reliable checkpoint materializes the RDD in a SECOND job when
        // writing the files — without a persist the whole round lineage
        // recomputes (2× compute per iteration). Persist DISK_ONLY first
        // so the checkpoint write reads the cached blocks.
        //
        // eager=false is HONORED here (optimization r19): the loop
        // callers' probe action is the very next statement, and a job on
        // any RDD derived from the marked one triggers the ancestor's
        // checkpoint write at job end (SparkContext.runJob →
        // rdd.doCheckpoint, recursive) — so the lazy path runs 2 jobs
        // per round (probe-computes-and-caches, write-reads-cache)
        // where the old forced-eager path ran 3 (count, write, probe);
        // the r19 before-bench charged t63/t71/t83 a third of their
        // warm time to exactly that extra per-round job. The pre-cut
        // DISK_ONLY cache can't be dropped synchronously in the lazy
        // path (the write hasn't happened yet) — it is registered and
        // released by the caller's per-round [[dropCheckpoint]] on the
        // superseded frame, with [[releasePins]] as the end-of-query
        // backstop, so at most the live round's cache is ever held.
        val cached = df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
        if (eager) {
          val cut = cached.checkpoint(eager = true)
          cached.unpersist(false)
          cut
        } else {
          val cut = cached.checkpoint(eager = false)
          cut.queryExecution.analyzed match {
            case l: org.apache.spark.sql.execution.LogicalRDD =>
              lazyCutCaches.put(l.rdd.id, cached)
            case _ => cached.unpersist(false) // unexpected root: no leak
          }
          cut
        }
      case None => df.localCheckpoint(eager)
    }

  /** Two-phase salted aggregation: stage 1 aggregates (key, salt) —
    * spreading each hot key over SaltBuckets reducers — stage 2 merges
    * the partials. Result is identical to the direct groupBy (the
    * partial/final split is associative), which is exactly what the
    * oracle checks. events has only 5 event_type values over 100k rows —
    * a genuinely skewed key. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column): DataFrame = {
    // salt by content hash MIXED with the per-partition row position
    // (monotonically_increasing_id = partition_id<<33 | local index):
    // content alone makes partials reproducible run-to-run, but all
    // IDENTICAL duplicate rows of a hot key hash to one salt bucket —
    // exactly the duplicated-log case salting exists for — silently
    // restoring the single-reducer hot spot. Mixing the position back in
    // keeps duplicates spread; given an identical partition layout the
    // partial (key, salt) shapes are still deterministic. Collisions are
    // harmless (a salt is only a spreading device; the merge is
    // associative).
    val salted = df.withColumn("_salt",
      pmod(xxhash64((df.columns.map(col) :+ monotonically_increasing_id()).toIndexedSeq: _*),
        lit(SaltBuckets.toLong)))
    salted
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), round(sum(col("ps")), 2).as("total"))
  }

  /** "Strictly earlier" bucket predicate with NULLS FIRST semantics (a
    * null bucket sorts before every non-null one, matching Spark's
    * default ascending sort): earlier(b, a) ⇔ b null ∧ a non-null, or
    * both non-null ∧ b < a. */
  private def earlierThan(b: Column, a: Column): Column =
    (b.isNull && a.isNotNull) || (b.isNotNull && a.isNotNull && b < a)

  /** Per-bucket cumulative offsets: for each (bucket, cnt) row of a
    * per-bucket count table, the summed counts of all strictly-earlier
    * buckets (NULLS FIRST). Tiny broadcast theta self-join (#buckets²
    * pairs) — the shared core of globalRowNumber and the histogram-pruned
    * exact quantiles. Output columns: (bucket, cnt, off) under the given
    * names. */
  private[graft] def bucketOffsets(counts: DataFrame, b: String, cnt: String,
      off: String): DataFrame =
    counts.as("gra").join(broadcast(counts.as("grb")),
        earlierThan(col(s"grb.$b"), col(s"gra.$b")), "left")
      .groupBy(col(s"gra.$b").as(b), col(s"gra.$cnt").as(cnt))
      .agg(coalesce(sum(col(s"grb.$cnt")), lit(0L)).as(off))

  /** Scale-safe global row_number / rank over a total order, without the
    * single-partition WindowExec that `Window.orderBy` (no partition)
    * produces. Shape: bucket rows by a monotone-in-sort-order expression
    * (ONE parallel shuffle of the fat table), rank within buckets, then
    * offset each bucket by the summed counts of all earlier buckets — a
    * #buckets-row aggregate joined back via broadcast. Total work is one
    * shuffle + one tiny theta join; at 100 TB every reducer sees one
    * bucket, never the whole table.
    *
    * `bucket` must be monotone non-decreasing along `order` (rows in a
    * smaller bucket sort strictly before rows in a larger one; ties of the
    * primary key must share a bucket — any deterministic banding of the
    * primary sort key qualifies; a NULL bucket is its own group ranked
    * first, mirroring NULLS FIRST). Choose banding so #buckets stays
    * O(100s) — e.g. from `approxQuantile` boundaries on a sample at scale.
    * When `order` is a total order (unique tie-break), row_number == rank.
    */
  def globalRowNumber(df: DataFrame, bucket: Column, order: Seq[Column],
      out: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = df.withColumn("_grk_bucket", bucket)
    val local = b.withColumn("_grk_local",
      row_number().over(Window.partitionBy(col("_grk_bucket")).orderBy(order: _*)))
    val counts = b.groupBy(col("_grk_bucket").as("_grk_bc")).agg(count(lit(1)).as("_grk_n"))
    val offsets = bucketOffsets(counts, "_grk_bc", "_grk_n", "_grk_off")
    // null-safe equality: rows in the NULL bucket keep their rank too
    local.join(broadcast(offsets), col("_grk_bucket") <=> col("_grk_bc"))
      .withColumn(out, (col("_grk_off") + col("_grk_local")).cast("long"))
      .drop("_grk_bucket", "_grk_local", "_grk_bc", "_grk_n", "_grk_off")
  }

  /** Data-derived banding for [[globalRowNumber]]: band edges from
    * `approxQuantile` (Greenwald-Khanna over one pass — the "derive
    * banding from a sample" posture the globalRowNumber scaladoc asks
    * for), returned as a monotone bucket expression usable as the
    * `bucket` argument. Unlike a fixed `floor(x/width)` band, quantile
    * edges bound BOTH the bucket count (≤ n, regardless of the metric's
    * range — no #buckets² offsets-join blowup when per-user sums span
    * orders of magnitude) and the per-bucket row count (≈ N/n even
    * under value skew). bucket(x) = #edges ≤ x is non-decreasing in x,
    * and NULL metrics map to bucket 0, where NULLS FIRST ordering puts
    * them. Costs one extra pass over `df` (the quantile job) — pass a
    * materialized/cut frame when the plan below it is expensive. */
  def quantileBuckets(df: DataFrame, metric: Column, n: Int): Column =
    bucketsFromEdges(metric, quantileEdges(df, Seq(metric), n).head)

  /** The quantile pass behind [[quantileBuckets]], exposed for callers
    * banding SEVERAL metrics of one frame: all columns share a single
    * data pass (`approxQuantile`'s multi-column form), so three RFM
    * dimensions cost one job, not three. Returns one edge array per
    * metric, in input order. */
  def quantileEdges(df: DataFrame, metrics: Seq[Column], n: Int): Seq[Array[Double]] = {
    require(n >= 2, s"quantileEdges: need n >= 2 bands, got $n")
    val named = df.select(metrics.zipWithIndex.map {
      case (m, i) => m.cast("double").as(s"_qe_$i") }: _*)
    named.stat.approxQuantile(metrics.indices.map(i => s"_qe_$i").toArray,
        (1 until n).map(_.toDouble / n).toArray, 0.001)
      .toSeq.map(_.distinct.sorted)
  }

  /** Monotone band expression from precomputed edges:
    * bucket(x) = #edges ≤ x (NULL metrics land in band 0, where NULLS
    * FIRST ordering puts them). Evaluates as the codegen'd binary-search
    * [[graft.functions.BandBucket]] — the earlier sum-of-64-`when`s
    * chain was the dominant per-row cost of every banding query. */
  def bucketsFromEdges(metric: Column, edges: Array[Double]): Column =
    if (edges.isEmpty) lit(0L)
    else coalesce(
      // typedlit, not lit: lit(Array) builds a CreateArray of element
      // literals, which is not foldable — typedlit emits one array Literal
      call_function("graft_bucket", metric.cast("double"),
        typedlit[Seq[Double]](edges.toIndexedSeq)),
      lit(0L))

  /** Scale-safe global dense_rank over a BANDED key (distinct-value count
    * must be modest — banded/rounded keys, categories; document the bound
    * at the call site). dense_rank(k) = #distinct keys < k + 1, computed
    * on the distinct-key table via a broadcast theta join, then broadcast-
    * joined back to the fat table. The fat table is never re-shuffled.
    * A NULL key ranks first (NULLS FIRST), like the window function. */
  def globalDenseRank(df: DataFrame, key: Column, out: String): DataFrame = {
    val keys = df.select(key.as("_gdr_k")).distinct().withColumn("_gdr_one", lit(1))
    val ranks = keys.as("gda").join(broadcast(keys.as("gdb")),
        earlierThan(col("gdb._gdr_k"), col("gda._gdr_k")), "left")
      // count the match marker, not the key: a NULL earlier key (nulls
      // rank first) must still contribute to the rank of non-null keys
      .groupBy(col("gda._gdr_k"))
      .agg((count(col("gdb._gdr_one")) + 1L).as(out))
    df.join(broadcast(ranks), key <=> col("_gdr_k")).drop("_gdr_k")
  }

  /** SQL ntile(k) from a precomputed global row_number `rn` and total row
    * count `n`: the first (n % k) tiles get ceil(n/k) rows, the rest get
    * floor(n/k) — identical to WindowExec's NTile. Pure arithmetic, no
    * window. */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    val q = (n / k).cast("long") // floor: both sides integral
    val r = (n % k).cast("long")
    val big = r * (q + lit(1L)) // rows covered by the ceil-sized tiles
    when(rn <= big, (rn + q) / (q + lit(1L)))          // ceil(rn/(q+1))
      .otherwise(r + (rn - big + q - 1) / q)           // r + ceil((rn-big)/q)
      .cast("long")
  }

  /** Salted skewed aggregation == direct aggregation (oracle = direct). */
  val qSaltedAgg: Q = Q(
    "q75_salted_skew_agg",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    saltedCountSum(Tables.events(s, d), col("event_type"), col("value"))
      .select(col("k").as("event_type"), col("n"), col("total"))
      .orderBy(col("event_type"))
  }

  /** Z-order (Morton) layout audit — the multi-dimensional data-skipping
    * story (Delta/Iceberg OPTIMIZE ZORDER): interleave the bits of two
    * clustering keys (user bucket, day) so a 2-D box predicate touches
    * few contiguous "blocks" instead of every day-linear block. The
    * z-value is pure per-row bit arithmetic (codegen'd, identical SQL in
    * both engines); blocks are z>>5 groups standing in for files; the
    * output reports each block's min/max envelope and whether the box
    * query [ub 4..7]×[day 10..13] would scan it — the min/max skipping
    * decision a lakehouse makes from footer stats. */
  val qZorderLayout: Q = Q(
    "q157_zorder_layout",
    """WITH c AS (
      |  SELECT user_id % 16 AS ub, day(ts) - 1 AS d0 FROM events),
      |z AS (SELECT ub, d0,
      |        ((d0 & 1) << 0) | (((d0 >> 1) & 1) << 2) | (((d0 >> 2) & 1) << 4)
      |      | (((d0 >> 3) & 1) << 6) | (((d0 >> 4) & 1) << 8)
      |      | ((ub & 1) << 1) | (((ub >> 1) & 1) << 3) | (((ub >> 2) & 1) << 5)
      |      | (((ub >> 3) & 1) << 7) AS zv
      |      FROM c)
      |SELECT zv >> 5 AS block, CAST(count(*) AS BIGINT) AS n_rows,
      |       min(ub) AS min_ub, max(ub) AS max_ub,
      |       min(d0) AS min_d0, max(d0) AS max_d0,
      |       max(ub) >= 4 AND min(ub) <= 7 AND max(d0) >= 10 AND min(d0) <= 13
      |         AS would_scan
      |FROM z GROUP BY block ORDER BY block""".stripMargin
  ) { (s, d) =>
    // shiftleft/shiftright spellings: the >>/<< operator forms are
    // DuckDB-only; Spark's functions are the codegen'd equivalents
    val zbits = ((0 until 5).map(i =>
      s"shiftleft(shiftright(d0, $i) & 1, ${2 * i})") ++
      (0 until 4).map(i =>
        s"shiftleft(shiftright(ub, $i) & 1, ${2 * i + 1})")).mkString(" | ")
    graft.Tables.events(s, d)
      .select((col("user_id") % 16).as("ub"),
        (dayofmonth(col("ts")) - 1).cast("long").as("d0"))
      .withColumn("zv", expr(zbits))
      .groupBy((col("zv") / 32).cast("long").as("block"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("ub")).as("min_ub"), max(col("ub")).as("max_ub"),
        min(col("d0")).as("min_d0"), max(col("d0")).as("max_d0"),
        (max(col("ub")) >= 4 && min(col("ub")) <= 7 &&
          max(col("d0")) >= 10 && min(col("d0")) <= 13).as("would_scan"))
      .orderBy(col("block"))
  }

  val all: Seq[Q] = Seq(qSaltedAgg, qZorderLayout)
}
