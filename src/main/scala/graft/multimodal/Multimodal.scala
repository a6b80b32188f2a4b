package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** An opaque multimodal asset: binary payload + typed metadata. */
final case class Asset(asset_id: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])

/** Decoded media header (STUB decode — see [[Multimodal.decodeStub]]). */
final case class Decoded(asset_id: Long, kind: String, width: Int, height: Int,
                         channels: Int, n_frames: Int, n_bytes: Long)

/** One sampled frame of a (fake-)video asset. */
final case class Frame(asset_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

/** A fixed-width feature vector extracted from an asset. */
final case class AssetFeatures(asset_id: Long, features: Array[Float])

/** One (fake-)video frame's scalar feature (stub "luma" = exact integer
  * code-point sum of the frame's slice of the payload). */
final case class FrameEnergy(asset_id: Long, frame_idx: Int, energy: Long)

/** A resized asset (STUB resize — see [[Multimodal.resize]]). */
final case class AudioWindow(asset_id: Long, window_idx: Int, n_samples: Int,
                             energy: Long, peak: Long)
final case class Resized(asset_id: Long, kind: String, out_w: Int, out_h: Int,
                         n_out: Long, resized_bytes: Array[Byte])

/**
 * Multimodal-column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed by per-partition batch operators.
 *
 * The Spark-side architecture is the real thing — typed `Dataset[Asset]`
 * with binary payloads, `mapPartitions` operators that iterate in bounded
 * batches (the batch shape a vectorized/Arrow UDF would see), partition-by-
 * kind routing, explode-style frame sampling — while the codec itself is a
 * clearly-marked DETERMINISTIC STUB (`decodeStub`): this container has no
 * image/audio libraries, so the stub derives header fields arithmetically
 * from the payload. Swapping in a real decoder changes one function, not
 * the plumbing.
 *
 * Scale notes: binary payloads ride the scan (parquet binary column,
 * pruned unless referenced); decode is map-only (no shuffle); frame
 * sampling multiplies rows map-side only; `repartitionByKind` routes
 * assets so codec-specific resources (a decoder pool) initialize once per
 * partition, amortized across the batch — the mapPartitions iterator is
 * exactly where that pool lives at scale.
 */
object Multimodal {

  implicit val assetEnc: Encoder[Asset] = Encoders.product[Asset]
  implicit val decodedEnc: Encoder[Decoded] = Encoders.product[Decoded]
  implicit val frameEnc: Encoder[Frame] = Encoders.product[Frame]
  implicit val featEnc: Encoder[AssetFeatures] = Encoders.product[AssetFeatures]
  implicit val frameEnergyEnc: Encoder[FrameEnergy] = Encoders.product[FrameEnergy]
  implicit val resizedEnc: Encoder[Resized] = Encoders.product[Resized]
  implicit val audioWinEnc: Encoder[AudioWindow] = Encoders.product[AudioWindow]

  /** Batch size a real vectorized decoder would process per call. */
  val decodeBatchSize = 64

  /**
   * STUB DECODE — deterministic fake. A real implementation would call the
   * codec here (and ONLY here): e.g. javax.imageio / ffmpeg bindings over
   * `a.bytes`. Header fields are pure functions of the payload so tests
   * and oracles are exact.
   */
  def decodeStub(a: Asset): Decoded = {
    val n = a.bytes.length
    // first CODE POINT of the UTF-8 decode (deterministic for any bytes —
    // invalid sequences decode to U+FFFD), matching the SQL oracles'
    // ascii(substr(text,1,1)); the first RAW BYTE would diverge from them
    // on any document starting with a non-ASCII character
    val text = new String(a.bytes, java.nio.charset.StandardCharsets.UTF_8)
    val first = if (text.nonEmpty) text.codePointAt(0) else 0
    Decoded(
      a.asset_id, a.kind,
      width = 16 + n % 113,
      height = 16 + (n * 31 + first) % 97,
      channels = 1 + first % 3,
      n_frames = if (a.kind == "video") 1 + n % 7 else 1,
      n_bytes = n.toLong
    )
  }

  /** Route assets so each partition holds one kind (decoder-pool locality). */
  def repartitionByKind(assets: Dataset[Asset]): Dataset[Asset] =
    assets.repartition(col("kind"))

  /** Decode all assets, iterating in [[decodeBatchSize]] batches per
    * partition (the Arrow-ish batch shape). */
  def decode(assets: Dataset[Asset]): Dataset[Decoded] =
    assets.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        // a real decoder would process `batch` as one vectorized call
        batch.iterator.map(decodeStub)
      }
    }

  /** Sample every `stride`-th frame of video assets (map-side explode).
    * Frame bytes are a deterministic slice of the payload (STUB). The kind
    * filter is a Column predicate (not a typed lambda) so Catalyst pushes
    * it below the deserializer and into the scan — non-video assets are
    * dropped before any object allocation. */
  def sampleFrames(assets: Dataset[Asset], stride: Int): Dataset[Frame] =
    assets.filter(col("kind") === "video").flatMap { a =>
      val d = decodeStub(a)
      (0 until d.n_frames by stride).map { i =>
        val from = math.min(i * 8, a.bytes.length)
        val until = math.min(from + 8, a.bytes.length)
        Frame(a.asset_id, i, a.bytes.slice(from, until))
      }
    }

  /** Per-frame scalar feature of every frame of each video asset — the
    * input to shot/scene-boundary detection. A real implementation
    * computes mean luma (or a frame histogram) from the decoded frame
    * HERE and only here; the stub sums the frame's code-point slice so
    * the value is exactly oracle-reproducible. Map-only flatMap; frames
    * multiply rows map-side like [[sampleFrames]]. */
  def frameEnergies(assets: Dataset[Asset], frameLen: Int = 8): Dataset[FrameEnergy] =
    assets.filter(col("kind") === "video").flatMap { a =>
      val d = decodeStub(a)
      val cps = new String(a.bytes, java.nio.charset.StandardCharsets.UTF_8)
        .codePoints().toArray
      (0 until d.n_frames).map { i =>
        val from = math.min(i * frameLen, cps.length)
        val until = math.min(from + frameLen, cps.length)
        var e = 0L
        var j = from
        while (j < until) { e += cps(j); j += 1 }
        FrameEnergy(a.asset_id, i, e)
      }
    }

  /** Resize to fit within (w, h) — the STUB kernel downsamples the payload
    * by a deterministic byte stride (a real implementation calls the image
    * scaler here and ONLY here). Output dims clamp the decoded header to
    * the target box; map-only, batched like [[decode]]. */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Resized] =
    assets.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val d = decodeStub(a)
          val ow = math.min(d.width, w)
          val oh = math.min(d.height, h)
          val n = math.min(d.n_bytes, ow.toLong * oh * d.channels)
          val step = math.max(1L, d.n_bytes / math.max(n, 1L))
          val out = new Array[Byte](n.toInt)
          var i = 0
          while (i < out.length) {
            out(i) = a.bytes(math.min((i * step).toInt, a.bytes.length - 1))
            i += 1
          }
          Resized(a.asset_id, a.kind, ow, oh, n, out)
        }
      }
    }

  /** Extract a fixed-width feature vector (STUB: per-dim seeded polynomial
    * hashes over the payload's UTF-8 code points, scaled to [0,1)) —
    * stands in for a real embedding model; shape/partitioning/batching are
    * what matter here. Code points (not raw bytes) so the arithmetic is
    * exactly reproducible by the SQL oracle's `ascii()` folds. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 8): Dataset[AssetFeatures] =
    assets.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val text = new String(a.bytes, java.nio.charset.StandardCharsets.UTF_8)
          val fs = Array.tabulate(dim) { d =>
            var h = (d * 1000003 + 17).toLong
            var i = 0
            while (i < text.length) {
              h = (h * 31 + text.codePointAt(i)) % 2147483647L
              i += (if (Character.isHighSurrogate(text.charAt(i)) && i + 1 < text.length) 2 else 1)
            }
            (h % 1000L) / 1000.0f
          }
          AssetFeatures(a.asset_id, fs)
        }
      }
    }

  /** Fixed-length OVERLAPPING analysis windows over audio payloads (the
    * STFT/feature-frame shape: len-sample windows every hop samples) with
    * per-window integer energy and peak. The kind filter is a Column
    * predicate (pushes into the scan); windowing is a map-side explode —
    * rows multiply ~n/hop per asset with no shuffle. STUB sample decode:
    * the code points of the UTF-8 payload stand in for PCM samples (a
    * real implementation decodes `a.bytes` with the audio codec here and
    * ONLY here); energy/peak are exact integers, so the whole operator is
    * value-oracled. */
  def audioWindows(assets: Dataset[Asset], len: Int = 64, hop: Int = 32): Dataset[AudioWindow] =
    assets.filter(col("kind") === "audio").flatMap { a =>
      val text = new String(a.bytes, java.nio.charset.StandardCharsets.UTF_8)
      val cps = text.codePoints().toArray
      val n = cps.length
      val offs = if (n == 0) Seq.empty[Int] else (0 until n by hop)
      offs.map { off =>
        val end = math.min(off + len, n)
        var e = 0L
        var p = 0L
        var i = off
        while (i < end) { e += cps(i); if (cps(i) > p) p = cps(i); i += 1 }
        AudioWindow(a.asset_id, off / hop, end - off, e, p)
      }
    }

  /** Adapt `documents` into a fake asset table (text bytes as payload;
    * kind round-robins image/audio/video) — the fixture has no binary
    * media, so the corpus is synthesized deterministically. */
  def documentsAsAssets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    // pure Column algebra (no typed map): the kind column is an expression
    // over doc_id, so downstream Column predicates (e.g. sampleFrames'
    // kind = 'video') collapse into the scan instead of being blocked
    // behind a deserializer
    spark.read.parquet(s"$dir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        element_at(
          array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")
        ).as("kind"),
        encode(col("text"), "UTF-8").as("bytes"), // == String.getBytes(UTF_8)
        map(lit("source"), col("source")).as("meta")
      )
      .as[Asset]
  }
}
