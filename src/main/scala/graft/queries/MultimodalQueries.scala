package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/**
 * Verify-gate queries for the multimodal plumbing. The decode is a
 * deterministic stub (see [[graft.multimodal.Multimodal.decodeStub]]), so
 * the DuckDB oracle can recompute the same header arithmetic from the
 * synthesized payload (documents text bytes).
 */
object MultimodalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode" -> { (s: SparkSession, dir: String) =>
      Multimodal.decode(Multimodal.repartitionByKind(Multimodal.documentsAsAssets(s, dir)))
        .toDF().orderBy("asset_id")
    },
    "mm_frames" -> { (s: SparkSession, dir: String) =>
      Multimodal.sampleFrames(Multimodal.documentsAsAssets(s, dir), stride = 2)
        .toDF().select(col("asset_id"), col("frame_idx")).orderBy("asset_id", "frame_idx")
    },
    // resize to a 32x32 box: dims clamp, payload downsampled (stub
    // kernel); scalar fields oracled, bytes pinned by MultimodalSpec
    "mm_resize" -> { (s: SparkSession, dir: String) =>
      Multimodal.resize(Multimodal.documentsAsAssets(s, dir), 32, 32)
        .toDF().select(col("asset_id"), col("kind"), col("out_w"), col("out_h"), col("n_out"))
        .orderBy("asset_id")
    },
    // overlapping analysis windows over audio payloads (64-sample
    // windows, hop 32): per-window integer energy/peak, fully oracled
    "mm_audio_windows" -> { (s: SparkSession, dir: String) =>
      Multimodal.audioWindows(Multimodal.documentsAsAssets(s, dir))
        .toDF().select(col("asset_id"), col("window_idx"), col("n_samples"),
          col("energy"), col("peak"))
        .orderBy("asset_id", "window_idx")
    },
    // CROSS-VIDEO FRAME DEDUP: frames whose content fingerprint repeats
    // in MORE THAN ONE asset — the video-corpus near-dup primitive
    // (mirrored uploads, shared intros/outros). The fingerprint is the
    // engine's own codegen'd graft_polyhash over each frame's slice of
    // the payload (a real pipeline swaps in pHash at the same spot);
    // only (fp, asset) pairs shuffle — frames themselves never move.
    "mm_frame_dedup" -> { (s: SparkSession, dir: String) =>
      s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("asset_id"), col("text"),
          length(encode(col("text"), "UTF-8")).as("n"))
        .select(col("asset_id"), col("text"),
          explode(sequence(lit(0), expr("CAST(n % 7 AS INT)"))).as("i"))
        .select(col("asset_id"),
          expr("substring(text, i * 8 + 1, 8)").as("sl"))
        .filter(length(col("sl")) > 0)
        .select(col("asset_id"), call_function("graft_polyhash", col("sl")).as("fp"))
        .groupBy("fp")
        .agg(countDistinct(col("asset_id")).as("n_assets"),
          count(lit(1)).as("n_frames"), min(col("asset_id")).as("min_asset"))
        .filter(col("n_assets") >= 2L)
        .orderBy("fp")
    },
    // SCENE-CUT DETECTION: consecutive-frame feature deltas above a
    // threshold — the shot-boundary pass of a video curation pipeline.
    // The per-frame feature comes from the mapPartitions-tier stub
    // decoder (real plumbing, fake luma); the boundary logic is a lag
    // window PARTITIONED by asset (bounded by frames-per-asset, never
    // corpus size). Fully oracled because the stub feature is an exact
    // code-point sum.
    "mm_scene_cuts" -> { (s: SparkSession, dir: String) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("asset_id").orderBy("frame_idx")
      Multimodal.frameEnergies(Multimodal.documentsAsAssets(s, dir)).toDF()
        .withColumn("e_prev", lag(col("energy"), 1).over(w))
        .filter(col("e_prev").isNotNull && abs(col("energy") - col("e_prev")) > 64L)
        .select(col("asset_id"), col("frame_idx"), col("e_prev"),
          col("energy").as("e_cur"),
          abs(col("energy") - col("e_prev")).as("delta"))
        .orderBy("asset_id", "frame_idx")
    },
    // feature stub = per-dim seeded code-point hash folds → fully oracled;
    // emitted as per-dim integer columns (features[i]*1000 is an exact
    // integer by construction, and a raw array<float> column would be
    // unsortable in the driver's compare)
    "mm_features" -> { (s: SparkSession, dir: String) =>
      val feats = Multimodal.extractFeatures(Multimodal.documentsAsAssets(s, dir)).toDF()
      val dims = (0 until 8).map(i =>
        round(element_at(col("features"), i + 1) * 1000).cast("int").as(s"f$i"))
      feats.select((col("asset_id") +: dims): _*).orderBy("asset_id")
    }
  )

  /** CTE: per-doc payload length (UTF-8 bytes), first byte, kind. */
  private val A =
    """WITH a AS (
      |  SELECT doc_id AS asset_id,
      |    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |    octet_length(encode(text)) AS n,
      |    CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END AS fb
      |  FROM documents
      |)""".stripMargin

  /** Exact SQL mirror of graft_polyhash (base-31 rolling hash mod 2^31-1
    * of lower(trim(s))) — same as the TextQueries/CorpusQueries mirrors. */
  private def fpSql(expr: String): String =
    s"""list_reduce(
       |    list_prepend(CAST(0 AS BIGINT),
       |      list_transform(string_split(lower(trim($expr)), ''), c -> CAST(ascii(c) AS BIGINT))),
       |    (h, c) -> (h * 31 + c) % 2147483647)""".stripMargin

  val oracles: Map[String, String] = Map(
    // frame i covers chars [i·8, i·8+8); fingerprint = the polyhash
    // mirror; only cross-asset repeats survive the HAVING
    "mm_frame_dedup" ->
      s"""WITH v AS (
         |  SELECT doc_id AS asset_id, text, octet_length(encode(text)) AS n
         |  FROM documents WHERE doc_id % 3 = 2
         |), f AS (
         |  SELECT asset_id, substr(text, u.i * 8 + 1, 8) AS sl
         |  FROM v, unnest(range(0, 1 + n % 7)) u(i)
         |), g AS (
         |  SELECT ${fpSql("sl")} AS fp, asset_id FROM f WHERE length(sl) > 0
         |)
         |SELECT fp, CAST(count(DISTINCT asset_id) AS BIGINT) AS n_assets,
         |  count(*) AS n_frames, min(asset_id) AS min_asset
         |FROM g GROUP BY fp HAVING count(DISTINCT asset_id) >= 2
         |ORDER BY fp""".stripMargin,
    "mm_decode" ->
      s"""$A SELECT asset_id, kind,
         |  CAST(16 + n % 113 AS INT) AS width,
         |  CAST(16 + (n * 31 + fb) % 97 AS INT) AS height,
         |  CAST(1 + fb % 3 AS INT) AS channels,
         |  CAST(CASE WHEN kind = 'video' THEN 1 + n % 7 ELSE 1 END AS INT) AS n_frames,
         |  CAST(n AS BIGINT) AS n_bytes
         |FROM a ORDER BY asset_id""".stripMargin,
    "mm_frames" ->
      s"""$A SELECT asset_id, CAST(u.i AS INT) AS frame_idx
         |FROM a, unnest(range(0, 1 + n % 7, 2)) AS u(i)
         |WHERE kind = 'video' ORDER BY asset_id, frame_idx""".stripMargin,
    // per-dim fold: h_d = fold over code points from seed d*1000003+17 of
    // (h*31 + cp) % 2147483647; f_d = h_d % 1000 (mirrors extractFeatures)
    "mm_features" -> {
      val dims = (0 until 8).map { d =>
        val seed = d * 1000003 + 17
        s"""CAST(list_reduce(list_prepend(CAST($seed AS BIGINT),
           |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           |    (h, c) -> (h * 31 + c) % 2147483647) % 1000 AS INT) AS f$d""".stripMargin
      }.mkString(",\n  ")
      s"""SELECT doc_id AS asset_id,
         |  $dims
         |FROM documents ORDER BY asset_id""".stripMargin
    },
    // code points as stub PCM samples; window w covers [w·32, w·32+64)
    "mm_audio_windows" ->
      """WITH c AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS cps
        |  FROM documents WHERE doc_id % 3 = 1
        |), w AS (
        |  SELECT asset_id, cps, len(cps) AS n,
        |         unnest(range(0, len(cps), 32)) AS off
        |  FROM c WHERE len(cps) > 0
        |)
        |SELECT asset_id, CAST(off // 32 AS INT) AS window_idx,
        |  CAST(least(off + 64, n) - off AS INT) AS n_samples,
        |  CAST(list_aggregate(list_slice(cps, off + 1, least(off + 64, n)), 'sum') AS BIGINT) AS energy,
        |  CAST(list_aggregate(list_slice(cps, off + 1, least(off + 64, n)), 'max') AS BIGINT) AS peak
        |FROM w ORDER BY asset_id, window_idx""".stripMargin,
    // frame i's stub luma = sum of code points [i·8, i·8+8); boundary =
    // |Δluma| > 64 between consecutive frames
    "mm_scene_cuts" ->
      """WITH c AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT)) AS cps,
        |    octet_length(encode(text)) AS n
        |  FROM documents WHERE doc_id % 3 = 2
        |), f AS (
        |  SELECT asset_id, CAST(u.i AS INT) AS frame_idx,
        |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_slice(cps, u.i * 8 + 1, u.i * 8 + 8)), (a, b) -> a + b) AS BIGINT) AS e
        |  FROM c, unnest(range(0, 1 + n % 7)) u(i)
        |), d AS (
        |  SELECT asset_id, frame_idx, e,
        |    lag(e) OVER (PARTITION BY asset_id ORDER BY frame_idx) AS ep
        |  FROM f
        |)
        |SELECT asset_id, frame_idx, ep AS e_prev, e AS e_cur, abs(e - ep) AS delta
        |FROM d WHERE ep IS NOT NULL AND abs(e - ep) > 64
        |ORDER BY asset_id, frame_idx""".stripMargin,
    "mm_resize" ->
      s"""$A SELECT asset_id, kind,
         |  CAST(LEAST(16 + n % 113, 32) AS INT) AS out_w,
         |  CAST(LEAST(16 + (n * 31 + fb) % 97, 32) AS INT) AS out_h,
         |  CAST(LEAST(n, LEAST(16 + n % 113, 32)
         |       * LEAST(16 + (n * 31 + fb) % 97, 32) * (1 + fb % 3)) AS BIGINT) AS n_out
         |FROM a ORDER BY asset_id""".stripMargin
  )
}
