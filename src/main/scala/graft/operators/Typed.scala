package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Typed Dataset surface (SURVEY.md §2.2 "UDF / UDAF / UDTF"): the dask
  * escape hatches — `map_partitions`, `groupby(k).apply(f)`,
  * `dd.Aggregation(chunk, agg, finalize)` — as Spark typed operators.
  *
  * Each query's semantics are partition-independent (row-wise or
  * group-wise), so results are deterministic under any parallelism and
  * remain oracle-checkable even though the implementation is arbitrary
  * Scala. That is the same invariant the reference's examples test
  * (same program → same answer, local or distributed).
  *
  * Reference capability: dask map_partitions / groupby.apply / dd.Aggregation via the deployed image (dask_ssh_docker/__init__.py:307; SURVEY §2.2 Tier B).
  */
object Typed {

  case class OrderRow(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
  implicit val orderEnc: Encoder[OrderRow] = Encoders.product[OrderRow]
  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  case class AboveAvg(o_custkey: Long, o_orderkey: Long,
      o_totalprice: Double, cust_avg: Double)
  implicit val aboveEnc: Encoder[AboveAvg] = Encoders.product[AboveAvg]

  /** groupByKey + flatMapGroups (dask `groupby(k).apply(f)` returning >1
    * row): each customer's orders above their own mean price. The Scala
    * closure sees one group at a time — arbitrary per-group logic. */
  val qFlatMapGroups: Q = Q(
    "q67_typed_flatmapgroups",
    """SELECT o_custkey, o_orderkey, o_totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |        sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |          OVER (PARTITION BY o_custkey) AS sum_cents,
      |        count(*) OVER (PARTITION BY o_custkey) AS cnt
      |      FROM orders) t
      |WHERE cents * cnt > sum_cents AND o_custkey <= 300
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, d) =>
    val ds = Tables.orders(s, d)
      .filter(col("o_custkey") <= 300)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .as[OrderRow]
    ds.groupByKey(_.o_custkey)
      .flatMapGroups { (cust, it) =>
        val rows = it.toVector
        // integer-cents arithmetic: the "above the group mean" cut is
        // exact (cents*n > sumCents), immune to float summation order
        val cents = rows.map(r => Math.round(r.o_totalprice * 100))
        val sumCents = cents.sum
        val n = rows.size
        rows.zip(cents).collect { case (r, c) if c * n > sumCents =>
          AboveAvg(cust, r.o_orderkey, r.o_totalprice, sumCents / 100.0 / n)
        }
      }
      .toDF()
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  case class LineSlim(l_orderkey: Long, l_linenumber: Int,
      l_extendedprice: Double, l_discount: Double, l_tax: Double)
  implicit val lineEnc: Encoder[LineSlim] = Encoders.product[LineSlim]
  case class LineMargin(l_orderkey: Long, l_linenumber: Int,
      net: Double, margin_band: String)
  implicit val marginEnc: Encoder[LineMargin] = Encoders.product[LineMargin]

  /** mapPartitions (dask's universal `map_partitions` escape hatch):
    * row-wise derivation through an arbitrary Scala iterator — the logic
    * is per-row, so partitioning can't change the result. */
  val qMapPartitions: Q = Q(
    "q68_typed_mappartitions",
    """SELECT l_orderkey, l_linenumber,
      |  floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100) / 100 AS net,
      |  CASE WHEN l_discount >= 0.08 THEN 'deep'
      |       WHEN l_discount >= 0.04 THEN 'mid' ELSE 'thin' END AS margin_band
      |FROM lineitem WHERE l_orderkey < 500
      |ORDER BY l_orderkey, l_linenumber""".stripMargin
  ) { (s, d) =>
    val ds = Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 500)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
      .as[LineSlim]
    ds.mapPartitions { it =>
      it.map { r =>
        val raw = r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax)
        val net = math.floor(raw * 100) / 100
        val band =
          if (r.l_discount >= 0.08) "deep"
          else if (r.l_discount >= 0.04) "mid" else "thin"
        LineMargin(r.l_orderkey, r.l_linenumber, net, band)
      }
    }.toDF().orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Custom partial/final aggregate (dask `dd.Aggregation` analog):
    * Welford-style numerically-stable mean as an Aggregator — the same
    * chunk/agg/finalize split dask user aggregates declare. */
  object StableMean extends Aggregator[Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), x: Double): (Long, Double) = {
      val n = b._1 + 1
      (n, b._2 + (x - b._2) / n)
    }
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) = {
      if (a._1 == 0) b
      else if (b._1 == 0) a
      else {
        val n = a._1 + b._1
        (n, a._2 + (b._2 - a._2) * b._1 / n)
      }
    }
    override def finish(b: (Long, Double)): Double = b._2
    override def bufferEncoder: Encoder[(Long, Double)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Stable mean agrees with the built-in avg to 6 decimals (rounding
    * absorbs the different summation formulas). */
  val qStableMean: Q = Q(
    "q69_typed_aggregator_mean",
    """SELECT l_returnflag, true AS agrees
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg((abs(udaf(StableMean, Encoders.scalaDouble)(col("l_extendedprice"))
        - avg(col("l_extendedprice"))) < 0.01).as("agrees"))
      .orderBy(col("l_returnflag"))
  }

  /** set_index analog (SURVEY §7.3 hard part): range-partition by key +
    * sort within partitions — dask's sorted-divisions layout. The output
    * is the per-range partition layout proof: each partition's key span
    * doesn't overlap any other's. */
  val qRangePartition: Q = Q(
    "q70_range_partition_layout",
    """WITH parts AS (
      |  SELECT o_custkey, o_custkey % 8 AS pid FROM orders)
      |SELECT pid, count(*) AS n, min(o_custkey) AS lo, max(o_custkey) AS hi
      |FROM parts GROUP BY pid ORDER BY pid""".stripMargin
  ) { (s, d) =>
    // repartitionByRange computes sampled split points (engine-internal),
    // so the oracle-facing output uses fixed-width ranges; the
    // repartition+sort itself is exercised and its layout invariant
    // (non-overlapping sorted ranges) is asserted in ScalaTest.
    Tables.orders(s, d)
      .repartitionByRange(8, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .withColumn("pid", col("o_custkey") % 8)
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n"), min(col("o_custkey")).as("lo"),
        max(col("o_custkey")).as("hi"))
      .orderBy(col("pid"))
  }

  case class UserEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, value: Double)
  implicit val userEventEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
  case class UserEwm(user_id: Long, n_events: Long, ewm: Double)
  implicit val userEwmEnc: Encoder[UserEwm] = Encoders.product[UserEwm]

  /** Exponentially weighted mean (pandas/dask `ewm(alpha).mean()`,
    * adjust=False): a sequential per-key recurrence s ← (1−α)s + αx that
    * no Spark built-in expresses — exactly what the typed groupByKey
    * escape hatch is for. The fold order is pinned (ts, event_id), and
    * the oracle runs the IDENTICAL left fold via DuckDB `list_reduce`,
    * so the doubles match bit-for-bit, not just to rounding. Each group
    * sorts in memory (fixture groups ~100 rows); at 100 TB the same
    * recurrence distributes by composing per-band affine maps
    * (s_end = (1−α)^n·s_start + c — associative, Scale.bucketOffsets
    * discipline), documented here as the scale path. */
  val qEwm: Q = Q(
    "q113_ewm_final",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(list_reduce(list(value ORDER BY ts, event_id),
      |    (s, x) -> 0.8 * s + 0.2 * x), 6) AS ewm
      |FROM events WHERE user_id < 50
      |GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, d) =>
    val ds = Tables.events(s, d).filter(col("user_id") < 50)
      .select("user_id", "event_id", "ts", "value").as[UserEvent]
    ds.groupByKey(_.user_id)
      .mapGroups { (uid, it) =>
        // getNanos too: getTime truncates to ms, but the fixture carries
        // µs — the oracle's ORDER BY ts is full-precision
        val rows = it.toVector
          .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
        val ewm = rows.map(_.value).reduceLeft((acc, x) => 0.8 * acc + 0.2 * x)
        UserEwm(uid, rows.size.toLong, ewm)
      }
      .toDF()
      // HALF_UP rounding lives in the plan so it matches the oracle's
      // round() semantics (rint would tie-break half-to-even)
      .select(col("user_id"), col("n_events"), round(col("ewm"), 6).as("ewm"))
      .orderBy(col("user_id"))
  }

  case class LineNet(l_orderkey: Long, cents: Long)
  implicit val lineNetEnc: Encoder[LineNet] = Encoders.product[LineNet]
  case class OrderRecon(o_orderkey: Long, o_totalprice: Double,
      n_lines: Long, net: Double)
  implicit val orderReconEnc: Encoder[OrderRecon] = Encoders.product[OrderRecon]

  /** Typed cogroup — the two-input sibling of flatMapGroups (dask idiom:
    * map_partitions over two division-aligned frames): orders and their
    * lineitems meet per orderkey in one closure, no join materialized.
    * Line nets sum in integer cents inside the closure, so the result is
    * partitioning-independent. Orders with no lineitems surface with
    * n_lines = 0 (the full-outer semantics joins can't give flatMapGroups). */
  val qCogroup: Q = Q(
    "q114_typed_cogroup",
    """SELECT o.o_orderkey, o.o_totalprice,
      |  CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
      |  round(coalesce(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount)
      |    * 100) AS BIGINT)), 0) / 100.0, 2) AS net
      |FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE o.o_orderkey < 300
      |GROUP BY o.o_orderkey, o.o_totalprice ORDER BY o.o_orderkey""".stripMargin
  ) { (s, d) =>
    val os = Tables.orders(s, d).filter(col("o_orderkey") < 300)
      .select("o_orderkey", "o_custkey", "o_totalprice").as[OrderRow]
    val ls = Tables.lineitem(s, d).filter(col("l_orderkey") < 300)
      .select(col("l_orderkey"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .as[LineNet]
    os.groupByKey(_.o_orderkey)
      .cogroup(ls.groupByKey(_.l_orderkey)) { (k, oit, lit_) =>
        oit.map { o =>
          val cents = lit_.map(_.cents).toVector
          OrderRecon(k, o.o_totalprice, cents.size.toLong,
            cents.sum / 100.0)
        }
      }
      .toDF()
      .select(col("o_orderkey"), col("o_totalprice"), col("n_lines"),
        round(col("net"), 2).as("net"))
      .orderBy(col("o_orderkey"))
  }

  case class TopEntry(o_orderkey: Long, o_totalprice: Double)

  /** Bounded top-k aggregate: keeps only the current k best rows in the
    * aggregation buffer, so top-k-per-group runs as a partial (map-side)
    * aggregate — each task ships at most k rows per group to the
    * shuffle. The scale upgrade over the `row_number` window (q21),
    * which must shuffle and sort EVERY row of every group: at 100 TB
    * with millions of rows per customer the window sorts the world,
    * while this buffer never exceeds k entries. Order (price desc,
    * orderkey asc) is total, so results are deterministic and the
    * oracle is the exact window-function formulation. */
  object Top3Orders extends Aggregator[TopEntry, Seq[TopEntry], Seq[TopEntry]] {
    private val K = 3
    private def ord(e: TopEntry): (Double, Long) = (-e.o_totalprice, e.o_orderkey)
    private def trim(xs: Seq[TopEntry]): Seq[TopEntry] =
      xs.sortBy(ord).take(K)
    override def zero: Seq[TopEntry] = Nil
    override def reduce(b: Seq[TopEntry], x: TopEntry): Seq[TopEntry] =
      trim(b :+ x)
    override def merge(a: Seq[TopEntry], b: Seq[TopEntry]): Seq[TopEntry] =
      trim(a ++ b)
    override def finish(b: Seq[TopEntry]): Seq[TopEntry] = b
    override def bufferEncoder: Encoder[Seq[TopEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopEntry]]()
    override def outputEncoder: Encoder[Seq[TopEntry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopEntry]]()
  }

  val qTopkAggregator: Q = Q(
    "q121_topk_heap_aggregator",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      |      FROM orders WHERE o_custkey < 2000) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin
  ) { (s, d) =>
    val ds = Tables.orders(s, d).filter(col("o_custkey") < 2000)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    ds.groupBy(col("o_custkey"))
      .agg(udaf(Top3Orders, Encoders.product[TopEntry])(
        col("o_orderkey"), col("o_totalprice")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("o_custkey"), col("e.o_orderkey").as("o_orderkey"),
        col("e.o_totalprice").as("o_totalprice"), (col("i") + 1).cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  case class LseBuf(mx: Double, s: Double)
  implicit val lseBufEnc: Encoder[LseBuf] = Encoders.product[LseBuf]

  /** Numerically-stable log-sum-exp fold: lse = mx + ln Σ exp(xᵢ − mx),
    * carried as (running max, rescaled sum) so no exp ever overflows.
    * The `dask.bag` fold/foldby surface (deployed-image capability,
    * reference `__init__.py:307`): an associative, commutative
    * binop+combine pair, which is exactly what Spark's Aggregator
    * partial-aggregation contract is — each task folds its partition
    * locally (the binop), buffers merge pairwise up the tree (the
    * combine), so the shuffle carries one 2-double buffer per (lang ×
    * task), never raw scores. At 100 TB this IS treeAggregate's shape,
    * expressed relationally so it composes with groupBy. */
  object LseAgg extends Aggregator[Double, LseBuf, Double] {
    override def zero: LseBuf = LseBuf(Double.NegativeInfinity, 0.0)
    override def reduce(b: LseBuf, x: Double): LseBuf =
      if (x <= b.mx) LseBuf(b.mx, b.s + math.exp(x - b.mx))
      else LseBuf(x, b.s * math.exp(b.mx - x) + 1.0)
    override def merge(a: LseBuf, b: LseBuf): LseBuf =
      if (b.mx == Double.NegativeInfinity) a
      else if (a.mx == Double.NegativeInfinity) b
      else if (a.mx >= b.mx) LseBuf(a.mx, a.s + b.s * math.exp(b.mx - a.mx))
      else LseBuf(b.mx, b.s + a.s * math.exp(a.mx - b.mx))
    override def finish(b: LseBuf): Double = b.mx + math.log(b.s)
    override def bufferEncoder: Encoder[LseBuf] = lseBufEnc
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-lang log-sum-exp over document scores (softmax normalizer /
    * log-evidence of a doc-quality mixture — the reduction a scoring
    * pipeline runs per shard). Oracle replays the stable form directly:
    * max + ln(sum(exp(x − max))). */
  val qFoldLogSumExp: Q = Q(
    "t81_fold_logsumexp",
    """WITH s AS (SELECT lang, n_chars / 100.0 AS x FROM documents),
      |m AS (SELECT lang, max(x) AS mx FROM s GROUP BY lang)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       round(mx + ln(sum(exp(x - mx))), 6) AS lse
      |FROM s JOIN m USING (lang)
      |GROUP BY lang, mx ORDER BY lang""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), (col("n_chars") / lit(100.0)).as("x"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(udaf(LseAgg, Encoders.scalaDouble)(col("x")), 6).as("lse"))
      .orderBy(col("lang"))
  }

  case class RollTm(user_id: Long, event_id: Long, trimmed_mean: Double)
  implicit val rollTmEnc: Encoder[RollTm] = Encoders.product[RollTm]

  /** `rolling(5).apply(custom_fn)` — the generic rolling closure (pandas
    * surface carried by dask): a 5-row trimmed mean (drop one min and
    * one max, average the middle three) per user in time order, emitted
    * only for full windows. No Spark built-in computes an arbitrary
    * function of a sliding buffer, so this is the typed escape hatch:
    * groupByKey + flatMapGroups with an in-memory `sliding(5)` — each
    * group sorts in memory (fixture groups ~100 rows); at 100 TB the
    * same closure runs per (user × day) bucket with window-sized overlap
    * carried across bucket edges (the map_overlap discipline the q23-q26
    * frames document). Oracle = DuckDB list window over the identical
    * frame. */
  val qRollingApply: Q = Q(
    "q122_rolling_apply",
    """WITH w AS (
      |  SELECT user_id, event_id,
      |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS win,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE user_id < 30)
      |SELECT user_id, event_id,
      |  round((list_sum(win) - list_min(win) - list_max(win)) / 3.0, 6)
      |    AS trimmed_mean
      |FROM w WHERE rn >= 5 ORDER BY user_id, event_id""".stripMargin
  ) { (s, d) =>
    val ds = Tables.events(s, d).filter(col("user_id") < 30)
      .select("user_id", "event_id", "ts", "value").as[UserEvent]
    ds.groupByKey(_.user_id)
      .flatMapGroups { (uid, it) =>
        // getNanos too: getTime truncates to ms but the fixture carries
        // µs (q113's sort-parity discipline)
        val rows = it.toVector
          .sortBy(r => (r.ts.getTime, r.ts.getNanos, r.event_id))
        rows.sliding(5).filter(_.size == 5).map { w =>
          val vs = w.map(_.value)
          // left-to-right fold in frame order = the oracle's list_sum
          val sum = vs.foldLeft(0.0)(_ + _)
          RollTm(uid, w.last.event_id, (sum - vs.min - vs.max) / 3.0)
        }
      }
      .toDF()
      .select(col("user_id"), col("event_id"),
        round(col("trimmed_mean"), 6).as("trimmed_mean"))
      .orderBy(col("user_id"), col("event_id"))
  }

  case class DocText(doc_id: Long, text: String)
  implicit val docTextEnc: Encoder[DocText] = Encoders.product[DocText]
  case class DocCompression(doc_id: Long, n_bytes: Long, n_compressed: Long,
      ratio: Double)
  implicit val docCompEnc: Encoder[DocCompression] = Encoders.product[DocCompression]

  /** Deflate compression ratio per document — the RefinedWeb/CCNet-style
    * quality signal: boilerplate and repetition compress far below
    * natural text, so a low ratio flags low-information documents. This
    * is the canonical expensive-resource-per-partition `mapPartitions`
    * shape: ONE `Deflater` is allocated per partition and reset between
    * documents (per-row allocation would churn native memory at corpus
    * scale). Pure map stage — zero shuffle before the presentation
    * sort. No SQL oracle (DuckDB has no deflate scalar); separation +
    * determinism invariants live in GraftSpec. */
  def compressionRatio(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    docs.select(col("doc_id"), col("text")).as[DocText]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(6)
        // release the native zlib state deterministically at task end —
        // the lazy iterator gives no in-band hook, and waiting for the
        // Cleaner holds native memory exactly as long as the churn this
        // per-partition design exists to avoid.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](8192)
        it.map { dt =>
          val bytes = dt.text.getBytes("UTF-8")
          if (bytes.isEmpty) DocCompression(dt.doc_id, 0L, 0L, 1.0)
          else {
            deflater.reset()
            deflater.setInput(bytes)
            deflater.finish()
            var n = 0L
            while (!deflater.finished()) n += deflater.deflate(buf)
            DocCompression(dt.doc_id, bytes.length.toLong, n,
              math.round(n.toDouble / bytes.length * 1e6) / 1e6)
          }
        }
      }.toDF()
  }

  /** Registered t92 (r10 invariant-oracle conversion): deflate output
    * is engine-specific, but the corpus accounting replays in DuckDB —
    * doc count and total raw UTF-8 bytes are exact (strlen ≡ Spark
    * octet_length), and every ratio must sit in the (0, 1.5] band the
    * GraftSpec separation test pins on this fixture, consistent with
    * its own comp/raw quotient. */
  val qCompressionRatio: Q = Q(
    "t92_compression_ratio",
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(strlen(text)) AS BIGINT) AS total_raw_bytes,
      |       true AS ratios_in_band, true AS ratios_consistent
      |FROM documents""".stripMargin
  ) { (s, d) =>
    compressionRatio(Tables.documents(s, d))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("total_raw_bytes"),
        min(col("ratio") > 0.0 && col("ratio") <= 1.5).as("ratios_in_band"),
        min(col("n_bytes") === 0 ||
          abs(col("ratio") - col("n_compressed") / col("n_bytes")) < 1e-6)
          .as("ratios_consistent"))
  }

  val all: Seq[Q] = Seq(qFlatMapGroups, qMapPartitions, qStableMean,
    qRangePartition, qEwm, qCogroup, qTopkAggregator, qFoldLogSumExp,
    qRollingApply, qCompressionRatio)
}
