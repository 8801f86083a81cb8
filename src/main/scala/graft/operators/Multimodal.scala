package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal column surface (SURVEY.md §2.3 / builder spec): image/audio/
  * video modeled as opaque `binary` columns with typed metadata. The
  * container ships no media codecs, so the DECODE step is a clearly-marked
  * deterministic stub; everything around it — schema, binary functions,
  * partitioning, typed batch iteration — is the real Spark plumbing a
  * production decode (JNI/codec per partition) would drop into.
  *
  * `documents.text` bytes stand in for the media payload.
  *
  * Tier C north-star extension (repo BASELINE.json; SURVEY §2.3) — beyond the reference surface.
  */
object Multimodal {

  /** Binary metadata extraction (the oracle-checkable part: byte length,
    * content hash, leading-bytes "magic number", every-16th-byte sample —
    * a frame-sample analog). */
  val qBinaryMeta: Q = Q(
    "m71_binary_metadata",
    """SELECT doc_id,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  sha256(text) AS content_sha,
      |  lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS magic,
      |  lower(array_to_string([hex(CAST(substr(text, i, 1) AS BLOB))
      |    FOR i IN range(1, greatest(CAST(length(text) AS BIGINT), 1) + 1, 16)], '')) AS sampled
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        length(bin).cast("long").as("n_bytes"),
        sha2(bin, 256).as("content_sha"),
        lower(hex(substring(bin, 1, 8))).as("magic"),
        lower(array_join(transform(
          sequence(lit(1L), greatest(length(col("text")).cast("long"), lit(1L)), lit(16L)),
          i => hex(substring(bin, i.cast("int"), lit(1)))), "")).as("sampled"))
      .orderBy(col("doc_id"))
  }

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  implicit val mediaEnc: Encoder[MediaRow] = Encoders.product[MediaRow]
  case class MediaFeatures(doc_id: Long, n_bytes: Long,
      mean_byte: Double, rms_byte: Double, n_frames: Int, embedding4: Array[Double])
  implicit val featEnc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]

  /** STUB decoder: stands in for an image/audio codec. A real deployment
    * replaces the body with the codec call (per-partition init, e.g. a
    * JNI handle, belongs in mapPartitions — which is exactly how this is
    * wired). Deterministic so tests can pin behavior. */
  private def decodeStub(payload: Array[Byte]): (Double, Double, Int, Array[Double]) = {
    // >>> replace from here with a real decoder <<<
    val n = payload.length.max(1)
    var sum = 0.0; var sq = 0.0
    payload.foreach { b => val v = (b & 0xFF).toDouble; sum += v; sq += v * v }
    val mean = sum / n
    val rms = math.sqrt(sq / n)
    val frames = (payload.length + 15) / 16
    val emb = Array.tabulate(4) { k =>
      var acc = 0.0
      var i = k
      while (i < payload.length) { acc += (payload(i) & 0xFF).toDouble; i += 4 }
      acc / n
    }
    (mean, rms, frames, emb)
    // >>> replace to here <<<
  }

  /** Feature extraction over binary payloads via typed mapPartitions
    * (per-partition batch iteration — where codec/model handles init once
    * per partition at scale). Row-wise semantics → partition-count
    * independent; ScalaTest pins determinism. The 4-dim embedding is
    * emitted as scalar columns e0..e3 (driver-facing outputs must be
    * sortable scalars, not arrays).
    *
    * Oracle-checked: the corpus is pure ASCII (length == octet_length at
    * every sf), so DuckDB reproduces the stub's byte statistics exactly
    * from `ascii()` codes — same sequential fold order, same divisors
    * (the stride sums divide by TOTAL length, as the stub does). */
  val qMediaFeatures: Q = Q(
    "m72_media_feature_stub",
    """WITH codes AS (
      |  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_bytes,
      |    greatest(length(text), 1) AS n,
      |    list_transform(range(1, length(text) + 1),
      |      i -> CAST(ascii(substr(text, i, 1)) AS DOUBLE)) AS cs
      |  FROM documents)
      |SELECT doc_id, n_bytes,
      |  round(coalesce(list_sum(cs), 0) / n, 6) AS mean_byte,
      |  round(sqrt(coalesce(list_sum(list_transform(cs, c -> c * c)), 0) / n), 6)
      |    AS rms_byte,
      |  CAST((n_bytes + 15) // 16 AS INTEGER) AS n_frames,
      |  round(coalesce(list_sum([cs[j] FOR j IN range(1, len(cs) + 1) IF (j - 1) % 4 = 0]), 0) / n, 6) AS e0,
      |  round(coalesce(list_sum([cs[j] FOR j IN range(1, len(cs) + 1) IF (j - 1) % 4 = 1]), 0) / n, 6) AS e1,
      |  round(coalesce(list_sum([cs[j] FOR j IN range(1, len(cs) + 1) IF (j - 1) % 4 = 2]), 0) / n, 6) AS e2,
      |  round(coalesce(list_sum([cs[j] FOR j IN range(1, len(cs) + 1) IF (j - 1) % 4 = 3]), 0) / n, 6) AS e3
      |FROM codes ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    val ds = Tables.documents(s, d)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRow]
    ds.mapPartitions { it =>
      // per-partition init site (codec handle / model session goes here)
      it.map { r =>
        val (mean, rms, frames, emb) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.payload.length.toLong, mean, rms, frames, emb)
      }
    }.toDF()
      .select(col("doc_id"), col("n_bytes"), round(col("mean_byte"), 6).as("mean_byte"),
        round(col("rms_byte"), 6).as("rms_byte"), col("n_frames"),
        round(col("embedding4")(0), 6).as("e0"), round(col("embedding4")(1), 6).as("e1"),
        round(col("embedding4")(2), 6).as("e2"), round(col("embedding4")(3), 6).as("e3"))
      .orderBy(col("doc_id"))
  }

  /** Mixed-modality join (SURVEY §2.3 "mixed text+vector joins"): binary
    * metadata ⋈ embedding vectors by id, aggregated per cluster. */
  val qMixedJoin: Q = Q(
    "m73_mixed_modal_join",
    s"""SELECT e.label, count(*) AS n,
       |  round(avg(d.n_chars), 4) AS avg_bytes,
       |  round(avg(${graft.functions.VectorOps.duckNorm("e.embedding")}), 6) AS avg_norm
       |FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
       |GROUP BY e.label ORDER BY e.label""".stripMargin
  ) { (s, d) =>
    Tables.documents(s, d)
      .join(Tables.embeddings(s, d), col("doc_id") === col("vec_id"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("n_chars")), 4).as("avg_bytes"),
        round(avg(graft.functions.VectorOps.norm(col("embedding"))), 6).as("avg_norm"))
      .orderBy(col("label"))
  }

  /** Frame sampling as ROW MULTIPLICITY (the shape that matters at scale:
    * one video row explodes into thousands of frame rows, so partition
    * sizing changes across the operator — after a real high-multiplicity
    * explode you repartition before heavy per-frame work). Each 16-byte
    * payload slice is a "frame"; per frame we emit its length, content
    * hash, and a RESIZE-analog (every-2nd-byte downsample, hex-encoded).
    * All slicing is codegen'd built-ins over the binary column — the
    * decode-free subset of the pipeline is fully relational and
    * oracle-checkable; a codec decode would slot into m72's mapPartitions
    * instead. */
  val qFrameExplode: Q = Q(
    "m74_frame_explode",
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS frame_idx
      |  FROM documents WHERE doc_id < 100 AND length(text) > 0),
      |f AS (SELECT doc_id, frame_idx,
      |        substr(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16) AS fr
      |      FROM idx)
      |SELECT doc_id, frame_idx,
      |  CAST(length(fr) AS BIGINT) AS frame_len,
      |  sha256(fr) AS frame_sha,
      |  lower(array_to_string([hex(CAST(substr(fr, j, 1) AS BLOB))
      |    FOR j IN range(1, CAST(length(fr) AS BIGINT) + 1, 2)], '')) AS resized_hex
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin
  ) { (s, d) =>
    val bin = col("text").cast("binary")
    val frame = col("fr")
    Tables.documents(s, d)
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select(col("doc_id"), bin.as("p"),
        ((length(bin) + 15) / 16).cast("long").as("nf"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("nf") - 1)).as("frame_idx"), col("p"))
      .withColumn("fr",
        substring(col("p"), (col("frame_idx") * 16 + 1).cast("int"), lit(16)))
      .select(col("doc_id"), col("frame_idx"),
        length(frame).cast("long").as("frame_len"),
        sha2(frame, 256).as("frame_sha"),
        lower(array_join(transform(
          sequence(lit(0), length(frame) - 1, lit(2)),
          j => hex(substring(frame, (j + 1).cast("int"), lit(1)))), ""))
          .as("resized_hex"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** ViT-style patch grid: each payload is cut into fixed 16-byte
    * patches laid out on an 8-wide grid — (patch_row, patch_col) ids +
    * per-patch bytes, the image-tokenization layout an encoder consumes.
    * Pure arithmetic + substring on the binary column: zero shuffle
    * until the presentation sort, embarrassingly parallel at any scale
    * (the m72 decode stub would slot in per patch). */
  val qPatchGrid: Q = Q(
    "m75_patch_grid",
    """WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
      |           FROM documents WHERE doc_id < 50),
      |p AS (SELECT doc_id, text, n,
      |        unnest(range(0, CAST(ceil(n / 16.0) AS BIGINT))) AS pid FROM d)
      |SELECT doc_id, pid // 8 AS patch_row, pid % 8 AS patch_col,
      |  CAST(least(n - pid * 16, 16) AS BIGINT) AS n_bytes,
      |  lower(hex(CAST(substr(text, CAST(pid * 16 + 1 AS INT), 16) AS BLOB)))
      |    AS patch_hex
      |FROM p ORDER BY doc_id, patch_row, patch_col""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"), length(col("text")).cast("long").as("n"))
    docs
      .select(col("doc_id"), col("text"), col("n"),
        explode(sequence(lit(0L),
          ceil(col("n") / lit(16.0)).cast("long") - 1)).as("pid"))
      .select(col("doc_id"),
        expr("pid div 8").as("patch_row"),
        (col("pid") % 8).as("patch_col"),
        least(col("n") - col("pid") * 16, lit(16L)).as("n_bytes"),
        lower(hex(substring(col("text").cast("binary"),
          (col("pid") * 16 + 1).cast("int"), lit(16)))).as("patch_hex"))
      .orderBy(col("doc_id"), col("patch_row"), col("patch_col"))
  }

  /** Keyframe sampling: keep every 4th frame of the m74 frame stream
    * (the video-pipeline decimation step — decode only sampled frames
    * downstream). Pure arithmetic filter on the frame index, applied
    * BEFORE any hashing, so 3/4 of the per-frame work is skipped, not
    * discarded: zero shuffle until the presentation sort, and the
    * sampled-frame rank (`kf_rank`) is derived arithmetically, not via
    * a window. The m72 decode stub would consume exactly these rows. */
  val qKeyframeSample: Q = Q(
    "m76_keyframe_sample",
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS frame_idx
      |  FROM documents WHERE doc_id < 100 AND length(text) > 0)
      |SELECT doc_id, frame_idx, frame_idx // 4 AS kf_rank,
      |  sha256(substr(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16)) AS frame_sha
      |FROM idx WHERE frame_idx % 4 = 0 ORDER BY doc_id, frame_idx""".stripMargin
  ) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select(col("doc_id"), bin.as("p"),
        ((length(bin) + 15) / 16).cast("long").as("nf"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("nf") - 1)).as("frame_idx"), col("p"))
      .filter(col("frame_idx") % 4 === 0)
      .select(col("doc_id"), col("frame_idx"),
        expr("frame_idx div 4").as("kf_rank"),
        sha2(substring(col("p"), (col("frame_idx") * 16 + 1).cast("int"), lit(16)),
          256).as("frame_sha"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** Scene-change detection (PySceneDetect-style content detector over
    * the m74 frame stream): per-frame "intensity" is a decode-free
    * deterministic scalar (first byte of the frame — a real decoder's
    * luma mean slots in via m72's mapPartitions), a cut fires when the
    * intensity jumps > 40 between CONSECUTIVE frames. lag() per doc over
    * frame_idx — the window partitions on doc_id, so a 2-hour video's
    * frames stay one partition while docs parallelize; per-doc output is
    * 1 row. */
  val qSceneChange: Q = Q(
    "m77_scene_change",
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS frame_idx
      |  FROM documents WHERE doc_id < 100 AND length(text) > 0),
      |f AS (SELECT doc_id, frame_idx,
      |        ord(substr(text, CAST(frame_idx * 16 + 1 AS BIGINT), 1)) AS intensity
      |      FROM idx),
      |dlt AS (SELECT doc_id, frame_idx, intensity,
      |          abs(intensity - lag(intensity) OVER
      |              (PARTITION BY doc_id ORDER BY frame_idx)) > 40 AS cut
      |        FROM f)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
      |       CAST(count(*) FILTER (WHERE cut) AS BIGINT) AS n_cuts,
      |       min(CASE WHEN cut THEN frame_idx END) AS first_cut
      |FROM dlt GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val f = Tables.documents(s, d)
      .filter(col("doc_id") < 100 && length(col("text")) > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L),
          ceil(length(col("text")) / 16.0).cast("long") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        expr("ascii(substring(text, cast(frame_idx * 16 + 1 as int), 1))")
          .as("intensity"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val dlt = f.withColumn("cut",
      abs(col("intensity") - lag(col("intensity"), 1).over(w)) > 40)
    dlt.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        count(when(col("cut"), lit(1))).as("n_cuts"),
        min(when(col("cut"), col("frame_idx"))).as("first_cut"))
      .orderBy(col("doc_id"))
  }

  /** Audio/video SYNC alignment (the multimodal track-merging step: a
    * video stream at one cadence, an audio stream at another, and each
    * audio chunk must attach to the latest video frame at-or-before its
    * timestamp — the A/V-sync as-of every caption/alignment pipeline
    * runs). Video frames tick every 40 ms (m74's 16-byte frames), audio
    * chunks every 23 ms (25-byte chunks); the match is the q46
    * union+window as-of keyed on doc_id, so a long recording's tracks
    * stay one ordered partition while docs parallelize; drift_ms is the
    * per-chunk A/V offset an alignment QA stage thresholds on. Oracle =
    * DuckDB native ASOF on the integer timelines. */
  val qAvSyncDrift: Q = Q(
    "m78_av_sync_drift",
    """WITH d AS (SELECT doc_id, length(text) AS n FROM documents
      |           WHERE doc_id < 30 AND length(text) > 0),
      |v AS (SELECT doc_id,
      |        unnest(range(0, CAST(ceil(n / 16.0) AS BIGINT))) * 40 AS v_ms
      |      FROM d),
      |a AS (SELECT doc_id,
      |        unnest(range(0, CAST(ceil(n / 25.0) AS BIGINT))) * 23 AS a_ms
      |      FROM d)
      |SELECT a.doc_id AS doc_id, a_ms, v_ms, CAST(v_ms / 40 AS BIGINT) AS v_idx,
      |       a_ms - v_ms AS drift_ms
      |FROM a ASOF JOIN v ON a.doc_id = v.doc_id AND a.a_ms >= v.v_ms
      |ORDER BY a.doc_id, a_ms""".stripMargin
  ) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .filter(col("doc_id") < 30 && length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).as("n"))
    val v = docs.select(col("doc_id"),
        explode(sequence(lit(0L),
          ceil(col("n") / 16.0).cast("long") - 1)).as("vi"))
      .select(col("doc_id"), (col("vi") * 40).as("ms"), lit(0).as("kind"),
        (col("vi") * 40).as("v_ms"))
    val a = docs.select(col("doc_id"),
        explode(sequence(lit(0L),
          ceil(col("n") / 25.0).cast("long") - 1)).as("ai"))
      .select(col("doc_id"), (col("ai") * 23).as("ms"), lit(1).as("kind"),
        lit(null).cast("long").as("v_ms"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ms"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.unionByName(a)
      .withColumn("m", last(col("v_ms"), ignoreNulls = true).over(w))
      .filter(col("kind") === 1)
      .select(col("doc_id"), col("ms").as("a_ms"), col("m").as("v_ms"),
        (col("m") / 40).cast("long").as("v_idx"),
        (col("ms") - col("m")).as("drift_ms"))
      .orderBy(col("doc_id"), col("a_ms"))
  }

  /** MULTIMODAL TOKEN BUDGETING — the packing step of a vision-language
    * training pipeline: each document costs text tokens PLUS image
    * tokens (one per 16-byte patch, the m75 grid model), and documents
    * pack greedily in doc_id order into 4096-token context bins.
    * Per-doc costs are a map-only scan (token count via size(filter(…)),
    * no explode); the running total uses the t67 banded-cumsum
    * discipline — band doc_id, per-band window, tiny per-band offsets
    * via theta join — so no unpartitioned window ever orders the corpus.
    * Output is bin-bounded: Σtokens / 4096 rows regardless of corpus
    * row count. */
  val qModalTokenBudget: Q = Q(
    "m79_modal_token_budget",
    """WITH d AS (SELECT doc_id,
      |    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
      |      x -> x <> '')) AS BIGINT) AS t_tok,
      |    CAST(ceil(length(text) / 16.0) AS BIGINT) AS patches
      |  FROM documents),
      |c AS (SELECT doc_id, t_tok, patches, t_tok + patches AS tot,
      |        CAST(sum(t_tok + patches) OVER (ORDER BY doc_id) AS BIGINT)
      |          AS cum
      |      FROM d)
      |SELECT CAST(floor((cum - tot) / 4096.0) AS BIGINT) AS bin_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(t_tok) AS BIGINT) AS text_tokens,
      |  CAST(sum(patches) AS BIGINT) AS image_tokens,
      |  round(sum(tot) / 4096.0, 6) AS fill
      |FROM c GROUP BY bin_id ORDER BY bin_id""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        expr("size(filter(split(lower(text), '[^a-z]+'), x -> x != ''))")
          .cast("long").as("t_tok"),
        ceil(length(col("text")) / lit(16.0)).cast("long").as("patches"))
      .withColumn("tot", col("t_tok") + col("patches"))
      .withColumn("_b", (col("doc_id") / 500).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_b")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val local = docs.withColumn("_local", sum(col("tot")).over(w))
    val bandTotals = docs.groupBy(col("_b").as("_bc"))
      .agg(sum(col("tot")).as("_bn"))
    val offsets = bandTotals.select(col("_bc").as("_ba"))
      .join(bandTotals, col("_bc") < col("_ba"))
      .groupBy(col("_ba")).agg(sum(col("_bn")).as("_off"))
    val cum = local.join(broadcast(offsets), col("_b") === col("_ba"), "left")
      .withColumn("cum", col("_local") + coalesce(col("_off"), lit(0L)))
    cum.withColumn("bin_id",
        floor((col("cum") - col("tot")) / lit(4096.0)).cast("long"))
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t_tok")).as("text_tokens"),
        sum(col("patches")).as("image_tokens"),
        round(sum(col("tot")) / lit(4096.0), 6).as("fill"))
      .orderBy(col("bin_id"))
  }

  /** CROSS-DOCUMENT FRAME DEDUP (the media analog of t51's exact text
    * dedup: identical frames — intro cards, logos, black frames —
    * recur across videos and waste decode + training budget): frames
    * hash by content (sha256 over the payload chunk, the m74 frame
    * stream), duplicates group on the hash, and each duplicate class
    * reports its copy count, how many distinct documents share it, and
    * the keep-first representative (min doc). The groupBy key is the
    * 64-hex digest — uniformly distributed, so the shuffle cannot skew
    * regardless of how hot one logo frame is; payload bytes never
    * shuffle (only doc_id + digest leave the map side after the
    * projection). Top-50 duplicate classes by copy count. */
  val qFrameDedup: Q = Q(
    "m80_frame_hash_dedup",
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, CAST(ceil(length(text) / 16.0) AS BIGINT))) AS frame_idx
      |  FROM documents WHERE doc_id < 200 AND length(text) > 0),
      |f AS (SELECT doc_id,
      |        sha256(substr(text, CAST(frame_idx * 16 + 1 AS BIGINT), 16)) AS frame_sha
      |      FROM idx)
      |SELECT frame_sha, CAST(count(*) AS BIGINT) AS n_copies,
      |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       min(doc_id) AS first_doc
      |FROM f GROUP BY frame_sha HAVING count(*) > 1
      |ORDER BY n_copies DESC, frame_sha LIMIT 50""".stripMargin
  ) { (s, d) =>
    val bin = col("text").cast("binary")
    Tables.documents(s, d)
      .filter(col("doc_id") < 200 && length(col("text")) > 0)
      .select(col("doc_id"), bin.as("p"),
        ((length(bin) + 15) / 16).cast("long").as("nf"))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("nf") - 1)).as("frame_idx"), col("p"))
      .select(col("doc_id"),
        sha2(substring(col("p"), (col("frame_idx") * 16 + 1).cast("int"),
          lit(16)), 256).as("frame_sha"))
      .groupBy(col("frame_sha"))
      .agg(count(lit(1)).as("n_copies"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_copies") > 1)
      .orderBy(desc("n_copies"), col("frame_sha")).limit(50)
  }

  val all: Seq[Q] = Seq(qBinaryMeta, qMediaFeatures, qMixedJoin, qFrameExplode,
    qPatchGrid, qKeyframeSample, qSceneChange, qAvSyncDrift,
    qModalTokenBudget, qFrameDedup)
}
