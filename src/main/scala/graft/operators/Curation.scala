package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Corpus-curation operators (SURVEY.md §2.3 extensions): the steps
  * between "cleaned documents" and "training batches" — fixed-budget
  * context packing, unigram language-model scoring, PII redaction, and
  * reproducible seeded shuffling.
  *
  * All four are declarative single-plan shapes with no global window:
  * the two total-order ops (packing, shuffle) route through
  * Scale.bucketOffsets / Scale.globalRowNumber so no reducer ever sees
  * the whole corpus.
  *
  * Tier C north-star extension (repo BASELINE.json; SURVEY §2.3) — no
  * counterpart in the reference source; grounded in the driver documents
  * fixture.
  */
object Curation {

  /** Context-window packing (concatenate-and-chunk, the GPT-style
    * pretraining batch layout): documents in doc_id order are laid
    * end-to-end on a global token tape; a document belongs to the
    * 1024-token window its FIRST token lands in. Needs a global running
    * token sum — computed scale-safe: band doc_id (monotone in the
    * order), per-band window cumsum, then offset each band by the summed
    * token counts of earlier bands (tiny broadcast theta join via
    * Scale.bucketOffsets. No single-partition WindowExec anywhere. */
  val qContextPacking: Q = Q(
    "t67_context_packing",
    """WITH d AS (SELECT doc_id,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |           FROM documents),
      |c AS (SELECT doc_id, n_tokens,
      |        sum(n_tokens) OVER (ORDER BY doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |          AS cum_prev
      |      FROM d)
      |SELECT CAST(cum_prev // 1024 AS BIGINT) AS window_id,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS window_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM c GROUP BY window_id ORDER BY window_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    // banding of the sort key: ~500 docs per band; any monotone banding
    // works (at 100 TB: approxQuantile boundaries on a sample)
    val banded = docs.withColumn("_b", (col("doc_id") / 500).cast("long"))
    val w = Window.partitionBy(col("_b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = banded.withColumn("_local", sum(col("n_tokens")).over(w))
    val counts = banded.groupBy(col("_b").as("_bc")).agg(sum(col("n_tokens")).as("_bn"))
    val offs = Scale.bucketOffsets(counts, "_bc", "_bn", "_off")
    local.join(broadcast(offs), col("_b") === col("_bc"))
      .withColumn("cum_prev", col("_off") + col("_local") - col("n_tokens"))
      .withColumn("window_id", expr("cum_prev div 1024"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("window_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("window_id"))
  }

  /** Unigram language-model quality score: avg ln p(token) per document
    * under the corpus's own unigram distribution — the cheap perplexity
    * proxy a pretraining pipeline uses to rank documents. The frequency
    * table is |vocab| rows (aggregated corpus-wide); vocab grows with
    * the corpus, so the token⋈freq join carries NO broadcast hint — AQE
    * broadcasts it at runtime while it fits under the threshold and
    * falls back to a shuffle join beyond that, which is exactly the
    * 100 TB behavior. The corpus-total IS always one row, so it alone
    * rides as a broadcast; no driver collect anywhere. */
  val qUnigramLogprob: Q = Q(
    "t68_unigram_logprob",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |             FROM documents),
      |freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
      |tot AS (SELECT sum(c) AS n FROM freq)
      |SELECT doc_id, round(avg(ln(c * 1.0 / n)), 6) AS avg_logprob,
      |       CAST(count(*) AS BIGINT) AS n_tokens
      |FROM tok JOIN freq USING (tok) CROSS JOIN tot
      |WHERE doc_id < 100
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val freq = tok.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = freq.agg(sum(col("c")).as("n"))
    tok.join(freq, Seq("tok"))
      .crossJoin(broadcast(tot))
      .filter(col("doc_id") < 100)
      .groupBy(col("doc_id"))
      .agg(round(avg(log(col("c") * lit(1.0) / col("n"))), 6).as("avg_logprob"),
        count(lit(1)).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** PII-style redaction (the regex scrub layer of a curation pipeline):
    * digit runs of 2+ become a <NUM> placeholder, with the redaction
    * count as an audit column. Codegen'd regexp_replace/regexp_count —
    * one projection, no shuffle; at 100 TB this is a pure map stage. */
  val qPiiRedaction: Q = Q(
    "t69_pii_redaction",
    """SELECT doc_id,
      |  regexp_replace(text, '[0-9][0-9]+', '<NUM>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text, '[0-9][0-9]+')) AS BIGINT)
      |    AS n_redacted
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        regexp_replace(col("text"), "[0-9][0-9]+", "<NUM>").as("redacted"),
        regexp_count(col("text"), lit("[0-9][0-9]+")).cast("long").as("n_redacted"))
      .orderBy(col("doc_id"))
  }

  /** Reproducible seeded corpus shuffle (training-data ordering): global
    * position = rank under md5(seed || doc_id) — engine-portable, seed-
    * deterministic, and scale-safe via Scale.globalRowNumber (bucket =
    * first two hex chars of the key, a monotone banding of the sort
    * order; no single-partition window). Emits the first 20 positions of
    * the permutation. */
  val qSeededShuffle: Q = Q(
    "t70_seeded_shuffle",
    """SELECT pos, doc_id FROM (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (
      |      ORDER BY md5('graft-shuffle-42:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS BIGINT) AS pos
      |  FROM documents) t
      |WHERE pos <= 20 ORDER BY pos""".stripMargin
  ) { (s, d) =>
    val keyed = Tables.documents(s, d).select(col("doc_id"))
      .withColumn("_k", md5(concat(lit("graft-shuffle-42:"),
        col("doc_id").cast("string"))))
    Scale.globalRowNumber(keyed, substring(col("_k"), 1, 2),
        Seq(col("_k"), col("doc_id")), "pos")
      .filter(col("pos") <= 20)
      .select(col("pos"), col("doc_id"))
      .orderBy(col("pos"))
  }

  /** Deterministic hash split (dask `random_split`'s reproducible
    * sibling, and how real pipelines carve train/val/test): bucket =
    * hash of the stable id, split by bucket range — membership is a pure
    * row-local function, stable under reruns, appends, and repartitions
    * (none of which hold for RNG-based splits). Engine-portable bucket:
    * two leading md5 hex chars → integer via ascii arithmetic. */
  val qHashSplit: Q = Q(
    "q104_hash_split",
    """WITH b AS (SELECT doc_id, lang,
      |    (ascii(substr(md5('graft-split-7:' || CAST(doc_id AS VARCHAR)), 1, 1)) * 131
      |     + ascii(substr(md5('graft-split-7:' || CAST(doc_id AS VARCHAR)), 2, 1))) % 100
      |      AS bkt
      |  FROM documents)
      |SELECT CASE WHEN bkt < 70 THEN 'train'
      |            WHEN bkt < 85 THEN 'val' ELSE 'test' END AS split,
      |       lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       min(doc_id) AS min_id, max(doc_id) AS max_id
      |FROM b GROUP BY split, lang ORDER BY split, lang""".stripMargin
  ) { (s, d) =>
    val k = md5(concat(lit("graft-split-7:"), col("doc_id").cast("string")))
    Tables.documents(s, d)
      .withColumn("bkt",
        (ascii(substring(k, 1, 1)) * 131 + ascii(substring(k, 2, 1))) % 100)
      .withColumn("split",
        when(col("bkt") < 70, "train").when(col("bkt") < 85, "val")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
      .orderBy(col("split"), col("lang"))
  }

  /** Deterministic per-group sampling (the reproducible form of
    * `groupby.sample`/reservoir selection, e.g. picking a fixed eval
    * subset per language): keep the k docs with the smallest
    * md5(seed ‖ id) within each group. Rank-k-by-hash is one partial
    * top-k per group — at scale Spark's window top-k over the group
    * partitioning; membership is stable under reruns and appends of
    * other groups. */
  val qHashSamplePerGroup: Q = Q(
    "q105_hash_sample_per_group",
    """SELECT lang, doc_id FROM (
      |  SELECT lang, doc_id,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5('graft-sample-3:' || CAST(doc_id AS VARCHAR)), doc_id)
      |      AS rn
      |  FROM documents) t
      |WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin
  ) { (s, d) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(concat(lit("graft-sample-3:"), col("doc_id").cast("string"))),
        col("doc_id"))
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("lang"), col("doc_id"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Fixed-k uniform sample — reservoir sampling's deterministic,
    * distributed equivalent: the k rows with the smallest
    * md5(seed ‖ id) are a uniform without-replacement draw of size k
    * (a random permutation's prefix), stable under reruns, appends of
    * later shards re-draw fairly, and membership is engine-portable
    * (unlike q34's engine-seeded Bernoulli, this hash-rank form hash-
    * matches DuckDB row-for-row). Spark plans orderBy+limit as
    * TakeOrderedAndProject: each partition keeps a local k-heap and
    * only k rows per partition reach the driver-side merge — no global
    * sort, no shuffle of non-winners, the same cost at any corpus size
    * (PlanSpec asserts the operator). */
  val qFixedKSample: Q = Q(
    "q196_fixed_k_sample",
    """SELECT doc_id FROM (
      |  SELECT doc_id FROM documents
      |  ORDER BY md5('graft-resk-5:' || CAST(doc_id AS VARCHAR)), doc_id
      |  LIMIT 100) t
      |ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        md5(concat(lit("graft-resk-5:"), col("doc_id").cast("string"))).as("_k"))
      .orderBy(col("_k"), col("doc_id"))
      .limit(100)
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  /** Group-aware (entity-level) train/val/test split — the leakage
    * guard q104's row-level split can't give: when rows of one entity
    * (a user's events, a patient's records) land in different splits,
    * the model trains on the test entities. Assigning the split from a
    * hash of the GROUP key makes membership a pure row-local function
    * of user_id — every row of a user lands in one split, with no join
    * against a user table and no shuffle beyond the output aggregate.
    * Same engine-portable md5 bucket as q104. The emitted leak_free
    * flag replays the guarantee: Σ per-split distinct users equals
    * global distinct users ⟺ no user appears in two splits. */
  val qGroupSplit: Q = Q(
    "q194_group_split",
    """WITH b AS (SELECT user_id,
      |    (ascii(substr(md5('graft-gsplit-11:' || CAST(user_id AS VARCHAR)), 1, 1)) * 131
      |     + ascii(substr(md5('graft-gsplit-11:' || CAST(user_id AS VARCHAR)), 2, 1))) % 100
      |      AS bkt
      |  FROM events),
      |s AS (SELECT CASE WHEN bkt < 80 THEN 'train'
      |             WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split, user_id
      |      FROM b),
      |grid AS (SELECT split, CAST(count(*) AS BIGINT) AS n_events,
      |                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |         FROM s GROUP BY split),
      |tot AS (SELECT count(DISTINCT user_id) AS g FROM b),
      |acr AS (SELECT sum(n_users) AS su FROM grid)
      |SELECT grid.split, grid.n_events, grid.n_users,
      |       (acr.su = tot.g) AS leak_free
      |FROM grid CROSS JOIN tot CROSS JOIN acr
      |ORDER BY split""".stripMargin
  ) { (s, d) =>
    val k = md5(concat(lit("graft-gsplit-11:"), col("user_id").cast("string")))
    val ev = Tables.events(s, d)
      .withColumn("bkt",
        (ascii(substring(k, 1, 1)) * 131 + ascii(substring(k, 2, 1))) % 100)
      .withColumn("split",
        when(col("bkt") < 80, "train").when(col("bkt") < 90, "val")
          .otherwise("test"))
    val grid = ev.groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val tot = ev.agg(countDistinct(col("user_id")).as("g"))
    val acr = grid.agg(sum(col("n_users")).as("su"))
    grid.crossJoin(broadcast(tot)).crossJoin(broadcast(acr))
      .select(col("split"), col("n_events"), col("n_users"),
        (col("su") === col("g")).as("leak_free"))
      .orderBy(col("split"))
  }

  /** Chronological split (train on the past, evaluate on the future) —
    * the temporal leakage axis q166's point-in-time join guards per
    * feature, applied to the dataset carve itself: a random split of
    * time-series data lets the model memorize the future. The boundary
    * is the data-derived 80th-percentile timestamp, floored to the
    * millisecond so the interpolated value is bit-identical across
    * engines. Exact `percentile` is the semantics contract (one
    * all-values sort buffer — the q82-documented swap to
    * percentile_approx / Scale.quantileEdges applies at 100 TB); the
    * split itself is a row-local comparison against the broadcast
    * boundary. The per-split (min_us, max_us) columns carry the
    * no-future-leak evidence: max(train) <= min(test). */
  val qTemporalSplit: Q = Q(
    "q195_temporal_split",
    """WITH b AS (SELECT CAST(floor(quantile_cont(epoch_us(ts), 0.8) / 1000)
      |                    AS BIGINT) * 1000 AS cut_us FROM events),
      |e AS (SELECT epoch_us(ts) AS us, user_id FROM events)
      |SELECT CASE WHEN e.us <= b.cut_us THEN 'train' ELSE 'test' END AS split,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       min(e.us) AS min_us, max(e.us) AS max_us
      |FROM e CROSS JOIN b GROUP BY split ORDER BY split""".stripMargin
  ) { (s, d) =>
    val ev = Tables.events(s, d)
      .select(unix_micros(col("ts")).as("us"), col("user_id"))
    val cut = ev.agg(
      (floor(expr("percentile(us, 0.8)") / 1000).cast("long") * lit(1000L))
        .as("cut_us"))
    ev.crossJoin(broadcast(cut))
      .withColumn("split",
        when(col("us") <= col("cut_us"), "train").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("us")).as("min_us"), max(col("us")).as("max_us"))
      .orderBy(col("split"))
  }

  /** Incremental (append-only) dedup gate — the 100 TB ingest shape: the
    * EXISTING corpus's content hashes fold into a Bloom filter (one
    * aggregate, mergeable across partitions), and each INCOMING doc
    * probes it map-side — no shuffle and no join of the incoming batch
    * against the full corpus. might_contain=false ⇒ definitely new
    * (Bloom has no false negatives — the property the spec asserts);
    * positives are the only docs that pay an exact-hash semi-join.
    * Engine-specific bits → no SQL oracle; CurationSpec owns it. */
  def bloomIncrementalDedup(existing: org.apache.spark.sql.DataFrame,
      incoming: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // self-sufficient on ANY session (the AsOf builder's discipline):
    // sessions that never touched Tables still get the graft registry
    graft.functions.GraftFunctions.ensureRegistered(existing.sparkSession)
    // might_contain requires its filter as a constant or scalar subquery
    // (the same contract Spark's own runtime join filters use), so the
    // one-row bloom aggregate rides in as a scalar subquery. The view
    // name is unique per call (and dropped once the plan is analyzed) so
    // concurrent calls on one session can't race on it and a user view
    // is never clobbered — Dataset analysis is eager, so the subquery
    // plan is already embedded by the time the view goes away.
    val view = s"graft_bloom_existing_${bloomViewSeq.incrementAndGet()}"
    existing
      .agg(expr("graft_bloom_agg(xxhash64(text), 100000L, 800000L)").as("bf"))
      .createOrReplaceTempView(view)
    try incoming.withColumn("maybe_dup",
      expr(s"graft_might_contain((SELECT bf FROM $view), xxhash64(text))"))
    finally existing.sparkSession.catalog.dropTempView(view)
  }

  private val bloomViewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Registered t73 (r10 invariant-oracle conversion): the Bloom BITS
    * are engine-specific, but the gate's contract replays in DuckDB —
    * incoming batch size and its TRUE duplicate count are exact, the
    * zero-false-negative guarantee is a theorem (every true dup must be
    * flagged), and the flagged count is capped at true-dups + 10% of
    * the batch + 1 (the CurationSpec FP bound, far under the filter's
    * design rate). */
  val qBloomIncremental: Q = Q(
    "t73_bloom_incremental_dedup",
    """SELECT CAST(count(*) AS BIGINT) AS n_incoming,
      |       CAST(count(*) FILTER (WHERE text IN
      |         (SELECT text FROM documents WHERE doc_id % 2 = 0))
      |         AS BIGINT) AS n_true_dups,
      |       true AS no_false_negatives, true AS fp_bounded
      |FROM documents WHERE doc_id % 2 = 1""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val existing = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    val dup = incoming
      .join(existing.select(col("text")).distinct(), Seq("text"), "left_semi")
      .select(col("doc_id")).withColumn("is_dup", lit(true))
    bloomIncrementalDedup(existing, incoming)
      .join(dup, Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
      .agg(count(lit(1)).as("n_incoming"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_true_dups"),
        min(!col("is_dup") || col("maybe_dup")).as("no_false_negatives"),
        (sum(when(col("maybe_dup"), 1L).otherwise(0L)) <=
          sum(when(col("is_dup"), 1L).otherwise(0L))
            + count(lit(1)) * 0.1 + 1).as("fp_bounded"))
  }

  /** C4-style boilerplate detection: a trigram shingle that appears in
    * many DISTINCT documents is boilerplate (nav bars, license headers,
    * templated spans); each document is scored by the fraction of its
    * shingles that are corpus-common. Pure relational: one shingle
    * explode, one frequency groupBy, one equi-join back — the same
    * shuffle-on-shingle shape as t54, but with NO pair join, so it does
    * not degenerate on repetitive corpora (frequency is a count, not a
    * pairing). At 100 TB the frequency table is vocab-sized and joins
    * shuffle-side under AQE, exactly like t68's unigram table. */
  val qBoilerplateNgrams: Q = Q(
    "t75_boilerplate_ngrams",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sh AS (SELECT doc_id,
      |         list_distinct(CASE WHEN len(t) >= 3
      |           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t) - 1)]
      |           ELSE [] END) AS shset
      |       FROM toks),
      |shx AS (SELECT doc_id, unnest(shset) AS s FROM sh),
      |freq AS (SELECT s, count(*) AS nd FROM shx GROUP BY s),
      |per AS (SELECT shx.doc_id, count(*) AS n_shingles,
      |               count(*) FILTER (WHERE f.nd >= 5) AS n_common
      |        FROM shx JOIN freq f USING (s) GROUP BY shx.doc_id)
      |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
      |       CAST(n_common AS BIGINT) AS n_common,
      |       round(n_common * 1.0 / n_shingles, 6) AS boilerplate_frac
      |FROM per ORDER BY boilerplate_frac DESC, doc_id LIMIT 20""".stripMargin
  ) { (s, d) =>
    // SHUFFLE_HASH on the frequency side (round 14): the default
    // sort-merge join SORTS both sides — two full orderings of the
    // corpus shingle stream by string key, which dominated the 2M-doc
    // smoke (~70 s of a ~80 s wall; hashed: ~8-12 s). The build side is
    // the frequency table (ONE row per distinct shingle per partition —
    // bounded build memory), and AQE's skew-join split handles hot
    // boilerplate shingles for shuffled-hash joins exactly as for
    // sort-merge, so the hint trades nothing away at scale.
    // Pinned: shx feeds the frequency table and the join's left side;
    // without the pin the shingle pipeline (and its dedup exchange over
    // the full shingle stream) runs twice — measured in-suite at the 2M
    // smoke: 30.4 s unpinned vs 18.3 s pinned (r14; an isolated-session
    // experiment leaned the other way, but the in-suite number is the
    // one the harness pays). At open scale the pin degrades gracefully:
    // MEMORY_AND_DISK spills, never recomputes.
    val shx = Text.shingled(Tables.documents(s, d))
      .transform(Scale.pin(_))
    val freq = shx.groupBy(col("s")).agg(count(lit(1)).as("nd"))
    shx.join(freq.hint("SHUFFLE_HASH"), Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        count(when(col("nd") >= 5, 1)).as("n_common"))
      .withColumn("boilerplate_frac",
        round(col("n_common") * lit(1.0) / col("n_shingles"), 6))
      .orderBy(desc("boilerplate_frac"), col("doc_id"))
      .limit(20)
  }

  /** RAG-style document chunking: fixed 32-token windows at stride 24
    * (8-token overlap), the retrieval-index layout. One sequence-explode
    * per doc — embarrassingly parallel, no shuffle at all (the orderBy
    * is presentation-only); chunk count and boundaries are arithmetic on
    * the token count, so both engines cut bit-identical chunks. */
  val qDocChunking: Q = Q(
    "t76_doc_chunking",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents WHERE doc_id < 100),
      |nc AS (SELECT doc_id, t, len(t) AS n,
      |         1 + CAST(ceil(greatest(len(t) - 32, 0) / 24.0) AS BIGINT) AS n_chunks
      |       FROM toks),
      |expanded AS (SELECT doc_id, t, n,
      |               unnest(range(0, n_chunks)) AS chunk_id FROM nc)
      |SELECT doc_id, chunk_id,
      |       CAST(least(n, chunk_id * 24 + 32) - chunk_id * 24 AS BIGINT) AS n_tokens,
      |       array_to_string(list_slice(t, chunk_id * 24 + 1,
      |         least(chunk_id * 24 + 32, n)), ' ') AS chunk_text
      |FROM expanded ORDER BY doc_id, chunk_id""".stripMargin
  ) { (s, d) =>
    val toks = Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")).cast("long"))
      .withColumn("n_chunks",
        lit(1L) + ceil(greatest(col("n") - 32, lit(0L)) / lit(24.0)).cast("long"))
    val nTok = least(col("n"), col("chunk_id") * 24 + 32) - col("chunk_id") * 24
    toks
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"), nTok.as("n_tokens"),
        concat_ws(" ", slice(col("t"),
          (col("chunk_id") * 24 + 1).cast("int"), nTok.cast("int"))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  /** Data-mixing sampler (the pretraining "mixture weights" step): each
    * source gets a token budget (even-numbered sources 2000, odd 1000 —
    * the stand-in for per-domain mixture weights), and docs are admitted
    * in seeded-hash order until the budget is spent (first doc crossing
    * the line is kept, the take-until convention). md5-hash order makes
    * the sample reproducible under reruns, appends, and repartitioning —
    * the same property q104/t70 rely on. Per-source window over the hash
    * order = bounded partitions (one per source); at 100 TB a giant
    * source routes through Scale.globalRowNumber banding like t70. */
  val qDataMixing: Q = Q(
    "t79_data_mixing",
    """WITH d AS (SELECT source, doc_id,
      |             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |             CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
      |                  THEN 2000 ELSE 1000 END AS budget,
      |             md5('mix42:' || CAST(doc_id AS VARCHAR)) AS h
      |           FROM documents),
      |c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY source
      |        ORDER BY h, doc_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
      |        AS cum_prev
      |      FROM d)
      |SELECT source, CAST(max(budget) AS BIGINT) AS budget,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN cum_prev < budget THEN 1 ELSE 0 END)
      |            AS BIGINT) AS n_selected,
      |       CAST(sum(CASE WHEN cum_prev < budget THEN n_tokens ELSE 0 END)
      |            AS BIGINT) AS tokens_selected
      |FROM c GROUP BY source ORDER BY source""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("budget",
        when(substring(col("source"), 4, 10).cast("int") % 2 === 0, 2000L)
          .otherwise(1000L))
      .withColumn("h", md5(concat(lit("mix42:"), col("doc_id").cast("string"))))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("cum_prev", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .groupBy(col("source"))
      .agg(max(col("budget")).as("budget"),
        count(lit(1)).as("n_docs"),
        sum(when(col("cum_prev") < col("budget"), 1L).otherwise(0L))
          .as("n_selected"),
        sum(when(col("cum_prev") < col("budget"), col("n_tokens")).otherwise(0L))
          .as("tokens_selected"))
      .orderBy(col("source"))
  }

  /** Sequence-length distribution (the batch-shape planning stat every
    * packing/bucketing stage needs): docs histogrammed into power-of-two
    * token buckets per language. Pure groupBy — one shuffle to ≤
    * |lang|×|bucket| rows; log2 on integer token counts is exact at the
    * bucket boundaries on both engines (powers of two are exactly
    * representable and log2 is correctly rounded there). */
  val qSeqlenHistogram: Q = Q(
    "t80_seqlen_histogram",
    """SELECT lang,
      |       CAST(floor(log2(n_tokens)) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tokens) AS BIGINT) AS tokens,
      |       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
      |       CAST(max(n_tokens) AS BIGINT) AS max_tokens
      |FROM (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT)
      |        AS n_tokens FROM documents) t
      |GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy(col("lang"), floor(log2(col("n_tokens"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
        min(col("n_tokens")).as("min_tokens"), max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("lang"), col("bucket"))
  }

  /** Source-diversity monitoring per language (the mixture-health stat a
    * curation dashboard tracks): distinct source count plus the Shannon
    * entropy of the source distribution — low entropy flags a language
    * dominated by one crawl/source. Two chained aggregates — (lang,
    * source) counts, then per-lang entropy over the count rows — both
    * map-side combined; the second input is |langs×sources| rows, tiny
    * at any corpus scale. Entropy accumulates ln on the p·ln p terms in
    * deterministic per-source order only up to fp sum order, same
    * round-6 discipline as every scored aggregate here. */
  val qSourceDiversity: Q = Q(
    "t89_source_diversity",
    """WITH c AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n
      |           FROM documents GROUP BY lang, source),
      |l AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang FROM c GROUP BY lang)
      |SELECT c.lang, CAST(count(*) AS BIGINT) AS n_sources,
      |  max(l.n_lang) AS n_docs,
      |  round(-sum((c.n * 1.0 / l.n_lang) * ln(c.n * 1.0 / l.n_lang)), 6)
      |    AS source_entropy
      |FROM c JOIN l ON c.lang = l.lang
      |GROUP BY c.lang ORDER BY c.lang""".stripMargin
  ) { (s, d) =>
    val c = Tables.documents(s, d)
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    val l = c.groupBy(col("lang").as("llang")).agg(sum(col("n")).as("n_lang"))
    val p = col("n") * lit(1.0) / col("n_lang")
    c.join(broadcast(l), col("lang") === col("llang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"), max(col("n_lang")).as("n_docs"),
        round(-sum(p * log(p)), 6).as("source_entropy"))
      .orderBy(col("lang"))
  }

  /** Deterministic WEIGHTED Bernoulli sampling (pandas
    * `df.sample(frac, weights=col)` made reproducible): each doc's keep
    * probability is proportional to its token count (longer docs more
    * likely kept — the quality-weighted curation admit), decided by a
    * seeded md5 bucket instead of an RNG, so the sample is identical
    * under reruns, appends, and repartitioning (q104's stability
    * argument, extended from uniform to weighted). Pure map stage +
    * one aggregate; oracled exactly because both engines compute the
    * same md5 arithmetic. */
  val qWeightedSample: Q = Q(
    "t93_weighted_sample",
    """WITH b AS (SELECT doc_id, lang,
      |    len(string_split(text, ' ')) AS n_tokens,
      |    (ascii(substr(md5('graft-wsample-3:' || CAST(doc_id AS VARCHAR)), 1, 1)) * 131
      |     + ascii(substr(md5('graft-wsample-3:' || CAST(doc_id AS VARCHAR)), 2, 1))) % 100
      |      AS bkt
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CAST(bkt < least(n_tokens, 90) AS BIGINT)) AS BIGINT) AS n_kept,
      |  round(sum(CASE WHEN bkt < least(n_tokens, 90) THEN n_tokens ELSE 0 END)
      |        * 1.0 / sum(n_tokens), 6) AS token_keep_frac
      |FROM b GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, d) =>
    val k = md5(concat(lit("graft-wsample-3:"), col("doc_id").cast("string")))
    val b = Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("bkt",
        (ascii(substring(k, 1, 1)) * 131 + ascii(substring(k, 2, 1))) % 100)
      .withColumn("keep", col("bkt") < least(col("n_tokens"), lit(90L)))
    b.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        round(sum(when(col("keep"), col("n_tokens")).otherwise(0L)) * lit(1.0)
          / sum(col("n_tokens")), 6).as("token_keep_frac"))
      .orderBy(col("lang"))
  }

  /** Temperature-based source mixing (the multilingual/multi-source
    * rebalancing rule: sample source s with probability ∝ pₛ^α, α<1
    * upweights the tail — the mT5/XLM-R mixing law; t79 then executes
    * budgets like these). One source-keyed aggregate → a |sources|-row
    * frame; totals and the normalizer ride broadcast 1-row aggregates,
    * so the corpus is scanned once whatever its size. pow() output is
    * rounded to 10 decimals in BOTH engines before normalizing (libm vs
    * JVM pow may differ in the last ulp — the v72 rounding discipline). */
  val qTemperatureMixing: Q = Q(
    "t103_temperature_mixing",
    """WITH s AS (SELECT source,
      |             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      |           FROM documents GROUP BY source),
      |t AS (SELECT sum(toks) AS tot FROM s),
      |p AS (SELECT source, toks,
      |        round(pow(toks * 1.0 / tot, 0.7), 10) AS pa
      |      FROM s CROSS JOIN t),
      |z AS (SELECT sum(pa) AS zsum FROM p)
      |SELECT source, toks, round(pa / zsum, 6) AS mix_weight,
      |       CAST(round(pa / zsum * 1000000, 0) AS BIGINT) AS target_tokens,
      |       round(pa / zsum * 1000000 / toks, 4) AS upsample_factor
      |FROM p CROSS JOIN z ORDER BY source""".stripMargin
  ) { (s, d) =>
    val src = Tables.documents(s, d)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
    val tot = src.agg(sum(col("toks")).as("tot"))
    val p = src.crossJoin(broadcast(tot))
      .select(col("source"), col("toks"),
        round(pow(col("toks") * lit(1.0) / col("tot"), 0.7), 10).as("pa"))
    val z = p.agg(sum(col("pa")).as("zsum"))
    p.crossJoin(broadcast(z))
      .select(col("source"), col("toks"),
        round(col("pa") / col("zsum"), 6).as("mix_weight"),
        round(col("pa") / col("zsum") * 1000000, 0).cast("long")
          .as("target_tokens"),
        round(col("pa") / col("zsum") * 1000000 / col("toks"), 4)
          .as("upsample_factor"))
      .orderBy(col("source"))
  }

  /** FEATURE HASHING (the hashing trick: categorical crosses → a fixed
    * 64-slot feature space with no dictionary to build, broadcast, or
    * keep consistent across training runs). The cross lang×source hashes
    * through the q104 deterministic md5 bucket; the output audits each
    * slot's load AND its collision count (distinct crosses per slot) —
    * the collision-rate check that decides whether 64 slots is enough.
    * One groupBy on the slot; no vocabulary state anywhere. */
  val qFeatureHashing: Q = Q(
    "t110_feature_hashing",
    """WITH f AS (SELECT (ascii(substr(md5(lang || 'x' || source), 1, 1)) * 131
      |             + ascii(substr(md5(lang || 'x' || source), 2, 1))) % 64
      |             AS slot,
      |             lang || 'x' || source AS cross_val
      |           FROM documents)
      |SELECT slot, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT cross_val) AS BIGINT) AS n_crosses,
      |       CAST(count(DISTINCT cross_val) > 1 AS BOOLEAN) AS collided
      |FROM f GROUP BY slot ORDER BY slot""".stripMargin
  ) { (s, d) =>
    val cross = concat(col("lang"), lit("x"), col("source"))
    val h = md5(cross)
    Tables.documents(s, d)
      .select(((ascii(substring(h, 1, 1)) * 131 + ascii(substring(h, 2, 1)))
        % 64).as("slot"), cross.as("cross_val"))
      .groupBy(col("slot"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("cross_val")).as("n_crosses"),
        (countDistinct(col("cross_val")) > 1).as("collided"))
      .orderBy(col("slot"))
  }

  /** GROUP-AWARE K-FOLD CROSS-VALIDATION assignment (round 11 — the
    * k-way generalization of q194's single train/val/test carve, the
    * fold layout hyperparameter search and OOF-prediction pipelines
    * run on): fold = seeded md5 bucket of the GROUP key mod 5, so
    * every event of a user lands in exactly one fold with no join and
    * no shuffle beyond the output aggregate, and fold membership is
    * stable under reruns, appends, and repartitioning (the q104
    * determinism contract). Each fold row carries its own leakage
    * evidence: Σ per-fold distinct users == global distinct users ⟺
    * no user straddles folds, and a ±40% balance band around the ideal
    * 1/k user share flags a broken hash. */
  val qKfoldAssignment: Q = Q(
    "q201_kfold_assignment",
    """WITH b AS (SELECT user_id,
      |    (ascii(substr(md5('graft-kfold-13:' || CAST(user_id AS VARCHAR)), 1, 1)) * 131
      |     + ascii(substr(md5('graft-kfold-13:' || CAST(user_id AS VARCHAR)), 2, 1))) % 5
      |      AS fold
      |  FROM events),
      |grid AS (SELECT fold, CAST(count(*) AS BIGINT) AS n_events,
      |                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |         FROM b GROUP BY fold),
      |tot AS (SELECT count(DISTINCT user_id) AS g FROM b),
      |acr AS (SELECT sum(n_users) AS su FROM grid)
      |SELECT CAST(grid.fold AS BIGINT) AS fold, grid.n_events, grid.n_users,
      |       (acr.su = tot.g) AS leak_free,
      |       (grid.n_users * 5.0 BETWEEN tot.g * 0.6 AND tot.g * 1.4)
      |         AS balanced
      |FROM grid CROSS JOIN tot CROSS JOIN acr
      |ORDER BY fold""".stripMargin
  ) { (s, d) =>
    val k = md5(concat(lit("graft-kfold-13:"), col("user_id").cast("string")))
    val ev = Tables.events(s, d)
      .withColumn("fold",
        ((ascii(substring(k, 1, 1)) * 131 + ascii(substring(k, 2, 1))) % 5)
          .cast("long"))
    val grid = ev.groupBy(col("fold"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val tot = ev.agg(countDistinct(col("user_id")).as("g"))
    val acr = grid.agg(sum(col("n_users")).as("su"))
    grid.crossJoin(broadcast(tot)).crossJoin(broadcast(acr))
      .select(col("fold"), col("n_events"), col("n_users"),
        (col("su") === col("g")).as("leak_free"),
        (col("n_users") * 5.0 >= col("g") * 0.6 &&
          col("n_users") * 5.0 <= col("g") * 1.4).as("balanced"))
      .orderBy(col("fold"))
  }

  /** TRAINING-SHARD EXPORT (round 11 — the pipeline's LAST step, after
    * dedup/filter/pack: materialize the curated corpus as N balanced
    * shards a training job streams): documents get t67's banded-cumsum
    * packing-window assignment, whole WINDOWS hash to shards (a packed
    * sequence must never straddle shards — the window is the training
    * atom), rows land via ONE `repartition(nShards, shard)` shuffle +
    * `partitionBy` layout, sorted within shards so readers see windows
    * contiguously. Alongside the data a MANIFEST is computed by
    * READING BACK what was written (the durability check, not a
    * pre-write guess): per shard, docs/windows/token counts and an
    * order-independent content fingerprint (Σ xxhash64(doc_id, text)
    * in exact decimal) — what a training launcher validates before
    * burning accelerator hours, and what makes two exports comparable
    * without re-reading payloads. Returns the manifest frame; also
    * writes it under `<dir>/_manifest` as json. */
  def writePackedShards(docs: org.apache.spark.sql.DataFrame, outDir: String,
      nShards: Int, seqTokens: Int = 1024): org.apache.spark.sql.DataFrame = {
    require(nShards > 0, s"writePackedShards: nShards must be > 0, got $nShards")
    val s = docs.sparkSession
    val base = docs.select(col("doc_id"), col("text"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val banded = base.withColumn("_b", (col("doc_id") / 500).cast("long"))
    val w = Window.partitionBy(col("_b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = banded.withColumn("_local", sum(col("n_tokens")).over(w))
    val counts = banded.groupBy(col("_b").as("_bc"))
      .agg(sum(col("n_tokens")).as("_bn"))
    val offs = Scale.bucketOffsets(counts, "_bc", "_bn", "_off")
    local.join(broadcast(offs), col("_b") === col("_bc"))
      .withColumn("window_id",
        ((col("_off") + col("_local") - col("n_tokens")) / seqTokens)
          .cast("long"))
      .withColumn("shard", pmod(xxhash64(col("window_id")), lit(nShards.toLong)))
      .select(col("doc_id"), col("text"), col("n_tokens"), col("window_id"),
        col("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("window_id"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val manifest = s.read.parquet(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("window_id")).as("n_windows"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(xxhash64(col("doc_id"), col("text")).cast("decimal(38,0)"))
          .cast("string").as("fingerprint"))
      .orderBy(col("shard"))
    manifest.coalesce(1).write.mode("overwrite").json(s"$outDir/_manifest")
    manifest
  }

  /** K-ANONYMITY AUDIT (round 11 — the compliance sibling of t69's PII
    * redaction: redaction scrubs direct identifiers, k-anonymity
    * measures whether QUASI-identifier combinations still single people
    * out): every (lang, source, length-band) equivalence class with
    * fewer than k = 5 members is a re-identification risk — its rows
    * are distinguishable by attributes alone. Emits each risky class
    * with its size plus corpus-level risk shares. One hash aggregate
    * over the quasi tuple (map-side combined) + a broadcast 1-row
    * total — the same plan at any corpus size; the mitigation loop
    * that drives this audit to zero risky classes is [[kAnonGeneralize]]
    * (t122 ledger / t123 generalized table, round 12). */
  val qKAnonymityAudit: Q = Q(
    "t120_k_anonymity_audit",
    """WITH q AS (SELECT lang, source,
      |             CAST(n_chars // 100 AS BIGINT) AS len_band,
      |             CAST(count(*) AS BIGINT) AS n
      |           FROM documents GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
      |               CAST(count(*) AS BIGINT) AS n_classes,
      |               CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |                 AS n_risky_docs
      |        FROM q)
      |SELECT q.lang, q.source, q.len_band, q.n,
      |       tot.n_classes, tot.n_risky_docs,
      |       round(tot.n_risky_docs * 1.0 / tot.n_docs, 6) AS risky_share
      |FROM q CROSS JOIN tot
      |WHERE q.n < 5
      |ORDER BY q.lang, q.source, q.len_band""".stripMargin
  ) { (s, d) =>
    val q = Tables.documents(s, d)
      .groupBy(col("lang"), col("source"),
        (col("n_chars") / 100).cast("long").as("len_band"))
      .agg(count(lit(1)).as("n"))
    val tot = q.agg(sum(col("n")).as("n_docs"),
      count(lit(1)).as("n_classes"),
      sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_risky_docs"))
    q.filter(col("n") < 5)
      .crossJoin(broadcast(tot))
      .select(col("lang"), col("source"), col("len_band"), col("n"),
        col("n_classes"), col("n_risky_docs"),
        round(col("n_risky_docs") * lit(1.0) / col("n_docs"), 6)
          .as("risky_share"))
      .orderBy(col("lang"), col("source"), col("len_band"))
  }

  // ---- k-anonymity GENERALIZATION (round 12 — the mitigation loop
  // t120's audit is the oracle for; VERDICT r11 missing #3) ----------

  /** The fixed full-domain generalization ladder over the QI tuple
    * (lang, source, len_band). Level semantics:
    *   0–3: length band widens 100 → 200 → 400 → 800 chars;
    *   4: length suppressed; 5: + source suppressed;
    *   6: + lang suppressed (one class = the whole corpus).
    * Full-domain (every row generalized to the same level — the
    * classic Samarati scheme) keeps the search SQL-expressible and the
    * scale shape trivial: every level is a ROLL-UP of the finest-level
    * class table, so the corpus is scanned once however many levels
    * the loop probes. `q0` must be the finest-level class table
    * (lang, source, b = n_chars div 100, n). */
  private def kAnonClassesAt(q0: org.apache.spark.sql.DataFrame,
      lv: Int): org.apache.spark.sql.DataFrame = lv match {
    case l if l <= 3 =>
      q0.groupBy(col("lang"), col("source"),
          (col("b") / (1L << l)).cast("long").as("g"))
        .agg(sum(col("n")).as("cn"))
    case 4 => q0.groupBy(col("lang"), col("source")).agg(sum(col("n")).as("cn"))
    case 5 => q0.groupBy(col("lang")).agg(sum(col("n")).as("cn"))
    case _ => q0.groupBy().agg(sum(col("n")).as("cn"))
  }

  private def kAnonQ0(docs: org.apache.spark.sql.DataFrame) =
    docs.groupBy(col("lang"), col("source"),
        (col("n_chars") / 100).cast("long").as("b"))
      .agg(count(lit(1)).as("n"))

  /** ITERATIVE QI-coarsening loop: walk the ladder until every
    * equivalence class reaches k, t63-style driver loop with a loud
    * cap. Each round is one O(|classes|)-row probe on a cached
    * finest-level class table — the PROBES aggregate the corpus
    * exactly once, whatever level the loop stops at (the kmeans
    * discipline: driver-held loop state, one tiny action per round).
    * The cache is scoped to this call (persisted here, released in a
    * finally — no registry entry, no caller release obligation; the
    * round-12 self-review flagged the previous Scale.pin as a leak for
    * direct API users), so the RETURNED table plans over a fresh class
    * aggregate and re-derives it on materialization — one extra
    * O(|classes|)-output pass, self-contained lifecycle.
    * The ladder's top level is the whole corpus in one class, so the
    * only unsatisfiable input is a corpus smaller than k — that (and
    * only that) throws, loudly, instead of emitting a table that
    * violates the k promise. Returns (chosen level, class table at
    * that level).
    *
    * DETERMINISM REQUIREMENT (r12 advisory): the probes run against a
    * persisted snapshot of `docs`' class aggregate, but the RETURNED
    * table re-derives that aggregate from `docs` on materialization
    * (the scoped-cache lifecycle above). `docs` must therefore be
    * deterministic across re-evaluation — a parquet/table scan, not a
    * non-seeded sample or an at-least-once stream — or the returned
    * classes can disagree with the ≥k guarantee the probes verified.
    * Every repo fixture satisfies this; callers passing arbitrary
    * DataFrames own the contract (the same re-evaluation rule Spark
    * itself assumes for any recomputed lineage). */
  def kAnonGeneralize(docs: org.apache.spark.sql.DataFrame,
      k: Int): (Int, org.apache.spark.sql.DataFrame) = {
    require(k >= 1, s"kAnonGeneralize: k must be >= 1, got $k")
    val q0 = kAnonQ0(docs).persist()
    try {
      val MaxLevel = 6
      var lv = 0
      while (lv <= MaxLevel) {
        val row = kAnonClassesAt(q0, lv).agg(min(col("cn"))).head()
        val minN = if (row.isNullAt(0)) 0L else row.getLong(0)
        if (minN >= k) return (lv, kAnonClassesAt(kAnonQ0(docs), lv))
        lv += 1
      }
      throw new IllegalStateException(
        s"kAnonGeneralize: ladder exhausted at full suppression and the " +
          s"single remaining class is still < k=$k — the corpus has fewer " +
          "than k rows; no generalization can satisfy k-anonymity")
    } finally q0.unpersist(blocking = false)
  }

  /** GENERALIZATION LEDGER: every ladder level's class count, smallest
    * class, residual risky mass, and information loss (normalized mean
    * generalization height — the Samarati/Mondrian loss proxy:
    * len_h/4, src_h, lang_h averaged), with the chosen level = the
    * least level whose smallest class reaches k = 5. The whole
    * trajectory in one plan AND one corpus pass: the finest-level
    * class aggregate feeds a single GROUPING SETS aggregate that
    * computes all seven levels together (grouping_id → level), and the
    * chosen level is a whole-frame min over the 7-row ledger — the
    * corpus is scanned once, shuffled once, with no duplicated
    * subtrees (a union of 7 roll-up branches would re-derive the
    * corpus aggregate per branch: Catalyst does not merge identical
    * aggregate subtrees, verified by explain in round 12). */
  val qKAnonLedger: Q = Q(
    "t122_kanon_generalize_ledger",
    """WITH q0 AS (SELECT lang, source, n_chars // 100 AS b, count(*) AS n
      |            FROM documents GROUP BY 1, 2, 3),
      |led AS (
      |  SELECT 0 AS level, count(*) AS n_classes, min(n) AS mn,
      |         sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS risky FROM q0
      |  UNION ALL SELECT 1, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 2)
      |  UNION ALL SELECT 2, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 4)
      |  UNION ALL SELECT 3, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 8)
      |  UNION ALL SELECT 4, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source)
      |  UNION ALL SELECT 5, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang)
      |  UNION ALL SELECT 6, count(*), min(n2),
      |    sum(CASE WHEN n2 < 5 THEN n2 ELSE 0 END)
      |    FROM (SELECT sum(n) AS n2 FROM q0)),
      |sel AS (SELECT min(level) AS lv FROM led WHERE mn >= 5)
      |SELECT CAST(level AS BIGINT) AS level,
      |       CAST(LEAST(level, 4) AS INT) AS len_h,
      |       CAST(CASE WHEN level >= 5 THEN 1 ELSE 0 END AS INT) AS src_h,
      |       CAST(CASE WHEN level >= 6 THEN 1 ELSE 0 END AS INT) AS lang_h,
      |       CAST(n_classes AS BIGINT) AS n_classes,
      |       CAST(mn AS BIGINT) AS min_class_n,
      |       CAST(risky AS BIGINT) AS n_risky_docs,
      |       round((LEAST(level, 4) / 4.0
      |              + CASE WHEN level >= 5 THEN 1 ELSE 0 END
      |              + CASE WHEN level >= 6 THEN 1 ELSE 0 END) / 3.0, 6)
      |         AS info_loss,
      |       mn >= 5 AS satisfied, level = sel.lv AS chosen
      |FROM led CROSS JOIN sel ORDER BY level""".stripMargin
  ) { (s, d) =>
    // ONE corpus aggregate, then ONE grouping-sets pass over the tiny
    // class table computes every ladder level together (7 separate
    // roll-up branches would each re-derive q0 — Catalyst does not
    // merge identical aggregate subtrees across a union); grouping_id
    // identifies the level. The chosen level comes from a 7-row
    // whole-frame window, so the ledger subtree is never duplicated.
    import org.apache.spark.sql.expressions.Window
    val q0 = kAnonQ0(Tables.documents(s, d))
    val lv = q0.select(col("lang"), col("source"), col("b"),
      (col("b") / 2).cast("long").as("b2"),
      (col("b") / 4).cast("long").as("b4"),
      (col("b") / 8).cast("long").as("b8"), col("n"))
    val sets = Seq(
      Seq(col("lang"), col("source"), col("b")), // L0 … gid 7
      Seq(col("lang"), col("source"), col("b2")), // L1 … gid 11
      Seq(col("lang"), col("source"), col("b4")), // L2 … gid 13
      Seq(col("lang"), col("source"), col("b8")), // L3 … gid 14
      Seq(col("lang"), col("source")), // L4 … gid 15
      Seq(col("lang")), // L5 … gid 31
      Seq()) // L6 … gid 63
    val classes = lv.groupingSets(sets, col("lang"), col("source"),
        col("b"), col("b2"), col("b4"), col("b8"))
      .agg(sum(col("n")).as("cn"), grouping_id().as("gid"))
      .withColumn("level",
        when(col("gid") === 7, 0L).when(col("gid") === 11, 1L)
          .when(col("gid") === 13, 2L).when(col("gid") === 14, 3L)
          .when(col("gid") === 15, 4L).when(col("gid") === 31, 5L)
          .otherwise(6L))
    val led = classes.groupBy(col("level"))
      .agg(count(lit(1)).as("n_classes"), min(col("cn")).as("min_class_n"),
        sum(when(col("cn") < 5, col("cn")).otherwise(0L)).as("n_risky_docs"))
    led.withColumn("lv",
        min(when(col("min_class_n") >= 5, col("level")))
          .over(Window.partitionBy())) // 7 rows by construction
      .select(col("level"),
        least(col("level"), lit(4L)).cast("int").as("len_h"),
        when(col("level") >= 5, 1).otherwise(0).cast("int").as("src_h"),
        when(col("level") >= 6, 1).otherwise(0).cast("int").as("lang_h"),
        col("n_classes"), col("min_class_n"), col("n_risky_docs"),
        round((least(col("level"), lit(4L)) / lit(4.0)
          + when(col("level") >= 5, 1).otherwise(0)
          + when(col("level") >= 6, 1).otherwise(0)) / lit(3.0), 6)
          .as("info_loss"),
        (col("min_class_n") >= 5).as("satisfied"),
        (col("level") === col("lv")).as("chosen"))
      .orderBy(col("level"))
  }

  /** FINAL GENERALIZED TABLE: the equivalence classes at the level the
    * [[kAnonGeneralize]] loop chose — every class ≥ k = 5 members,
    * suppressed dimensions shown as '*', kept length bands as
    * 'width:index'. The registered fn runs the REAL driver loop (one
    * probe per level on the pinned class table); the oracle recomputes
    * the same fixpoint in SQL (least satisfying ladder level), so the
    * hash compare pins loop and ladder agree. */
  val qKAnonGeneralized: Q = Q(
    "t123_kanon_generalized_classes",
    """WITH q0 AS (SELECT lang, source, n_chars // 100 AS b, count(*) AS n
      |            FROM documents GROUP BY 1, 2, 3),
      |led AS (
      |  SELECT 0 AS level, min(n) AS mn FROM q0
      |  UNION ALL SELECT 1, min(n2)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 2)
      |  UNION ALL SELECT 2, min(n2)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 4)
      |  UNION ALL SELECT 3, min(n2)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source, b // 8)
      |  UNION ALL SELECT 4, min(n2)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang, source)
      |  UNION ALL SELECT 5, min(n2)
      |    FROM (SELECT sum(n) AS n2 FROM q0 GROUP BY lang)
      |  UNION ALL SELECT 6, min(n2) FROM (SELECT sum(n) AS n2 FROM q0)),
      |sel AS (SELECT min(level) AS lv FROM led WHERE mn >= 5),
      |g AS (SELECT CASE WHEN sel.lv >= 6 THEN '*' ELSE lang END AS lang_g,
      |             CASE WHEN sel.lv >= 5 THEN '*' ELSE source END AS source_g,
      |             CASE WHEN sel.lv >= 4 THEN '*'
      |                  ELSE CAST(CASE sel.lv WHEN 0 THEN 100 WHEN 1 THEN 200
      |                            WHEN 2 THEN 400 ELSE 800 END AS VARCHAR)
      |                    || ':' ||
      |                    CAST(b // (CASE sel.lv WHEN 0 THEN 1 WHEN 1 THEN 2
      |                               WHEN 2 THEN 4 ELSE 8 END) AS VARCHAR)
      |             END AS len_band_g,
      |             n, sel.lv FROM q0 CROSS JOIN sel)
      |SELECT lang_g, source_g, len_band_g, CAST(sum(n) AS BIGINT) AS n,
      |       CAST(lv AS BIGINT) AS level
      |FROM g GROUP BY lang_g, source_g, len_band_g, lv
      |ORDER BY lang_g, source_g, len_band_g""".stripMargin
  ) { (s, d) =>
    val (lv, classes) = kAnonGeneralize(Tables.documents(s, d), 5)
    val out = lv match {
      case l if l <= 3 => classes.select(
        col("lang").as("lang_g"), col("source").as("source_g"),
        concat(lit((100L << l).toString), lit(":"),
          col("g").cast("string")).as("len_band_g"),
        col("cn").as("n"))
      case 4 => classes.select(col("lang").as("lang_g"),
        col("source").as("source_g"), lit("*").as("len_band_g"),
        col("cn").as("n"))
      case 5 => classes.select(col("lang").as("lang_g"),
        lit("*").as("source_g"), lit("*").as("len_band_g"),
        col("cn").as("n"))
      case _ => classes.select(lit("*").as("lang_g"),
        lit("*").as("source_g"), lit("*").as("len_band_g"),
        col("cn").as("n"))
    }
    out.withColumn("level", lit(lv.toLong))
      .orderBy(col("lang_g"), col("source_g"), col("len_band_g"))
  }

  /** QUALITY-AWARE canonical selection within duplicate clusters
    * (round 14 — the "keep-BEST" complement to t52's keep-first: real
    * pipelines don't keep the first-crawled member of a near-dup
    * cluster, they keep the highest-quality one). Blocking key = the
    * 5-token prefix (the cheap near-dup grouping key; the fixture's
    * prefix clusters all carry score-varied members, so the choice is
    * non-vacuous); quality score = distinct-token count — INTEGER, so
    * the argmax is engine-exact with no float compare at the cut;
    * canonical = argmax by (score, −doc_id), a UNIQUE ordering, so
    * both engines pick the same member deterministically.
    *
    * 100 TB shape: ONE map-side-combined aggregate — `max_by` over a
    * (score, −doc_id) struct ships a single candidate per (partition,
    * cluster) into the shuffle; no per-cluster window sort, no pair
    * join (the DuckDB oracle uses row_number — same values, but the
    * window form would sort every cluster at scale; PlanSpec pins the
    * window-free plan). */
  val qClusterCanonical: Q = Q(
    "t124_cluster_canonical",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |sc AS (SELECT doc_id, array_to_string(t[1:5], ' ') AS cluster,
      |              CAST(len(list_distinct(t)) AS BIGINT) AS score FROM d),
      |ranked AS (SELECT cluster, doc_id, score,
      |             count(*) OVER (PARTITION BY cluster) AS csize,
      |             row_number() OVER (PARTITION BY cluster
      |               ORDER BY score DESC, doc_id) AS rk
      |           FROM sc)
      |SELECT cluster, CAST(csize AS BIGINT) AS csize,
      |       doc_id AS canon_doc, score AS canon_score
      |FROM ranked WHERE rk = 1 AND csize >= 2
      |ORDER BY cluster""".stripMargin
  ) { (s, d) =>
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"),
        array_join(slice(col("t"), 1, 5), " ").as("cluster"),
        size(array_distinct(col("t"))).cast("long").as("score"))
    scored.groupBy(col("cluster"))
      .agg(count(lit(1)).as("csize"),
        max_by(col("doc_id"),
          struct(col("score"), (-col("doc_id")).as("nd"))).as("canon_doc"),
        max(col("score")).as("canon_score"))
      .filter(col("csize") >= 2)
      .orderBy(col("cluster"))
  }

  val all: Seq[Q] = Seq(qContextPacking, qUnigramLogprob, qPiiRedaction,
    qSeededShuffle, qHashSplit, qHashSamplePerGroup, qBloomIncremental,
    qBoilerplateNgrams, qDocChunking, qDataMixing, qSeqlenHistogram,
    qSourceDiversity, qWeightedSample, qTemperatureMixing, qFeatureHashing,
    qGroupSplit, qTemporalSplit, qFixedKSample, qKfoldAssignment,
    qKAnonymityAudit, qKAnonLedger, qKAnonGeneralized, qClusterCanonical)
}
