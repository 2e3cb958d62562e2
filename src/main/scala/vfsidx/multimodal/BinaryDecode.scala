package vfsidx.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}

/** One multimodal asset: opaque binary payload + typed metadata. At 100 TB
  * the payload column stays in parquet/Iceberg as `binary` (never decoded
  * during planning; column pruning means metadata-only queries never read
  * it), and decode happens inside `mapPartitions` so per-partition codec
  * state (decoder contexts, buffers) is allocated once per task, not per
  * row — the same batch shape a Pandas-UDF/`mapInPandas` pipeline has. */
final case class Asset(asset_id: Long, kind: String, payload: Array[Byte])

final case class DecodedMeta(
    asset_id: Long,
    kind: String,
    width: Int,
    height: Int,
    n_frames: Int,
    bytes: Int)

final case class Frame(asset_id: Long, frame_idx: Int, feature: Array[Float])

/** Multimodal decode / feature-extract / frame-sample plumbing.
  *
  * The actual codec is a clearly-marked deterministic STUB — this container
  * has no image/audio libraries — but everything Spark-side is real: the
  * binary column schema, the once-per-partition decoder allocation, the
  * explode of sampled frames, and the bounded batch shape. Swapping
  * [[StubCodec]] for a JNI/javacv decoder changes no plan shape.
  */
object BinaryDecode {

  /** STUB codec: parses fake metadata from the payload header bytes.
    * Deterministic; stands in for an image/video header parse. */
  object StubCodec {
    final case class Meta(width: Int, height: Int, nFrames: Int)
    def parseHeader(payload: Array[Byte]): Meta = {
      require(payload.length >= 3, "payload too short for header")
      val w = payload(0) & 0xff
      val h = payload(1) & 0xff
      Meta(w, h, ((payload(2) & 0xff) % 4) + 1)
    }
    /** Fake per-frame feature vector (e.g. a pooled embedding). */
    def frameFeature(payload: Array[Byte], frameIdx: Int, dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val b = payload((frameIdx + i) % payload.length) & 0xff
        out(i) = b / 255.0f
        i += 1
      }
      out
    }

    /** Aspect-ratio-preserving fit into a `box`-square: the real arithmetic
      * of a resize step (the pixel resample itself is the stubbed part).
      * Integer math so every engine agrees exactly. */
    def fitWithin(w: Int, h: Int, box: Int): (Int, Int) = {
      require(w > 0 && h > 0 && box > 0)
      if (w <= box && h <= box) (w, h)
      else {
        val m = math.max(w, h)
        (math.max(1, w * box / m), math.max(1, h * box / m))
      }
    }
  }

  /** Resize plan: decode header -> compute target dims -> (stub) resample.
    * One narrow mapPartitions pass, no shuffle. */
  final case class Resized(asset_id: Long, width: Int, height: Int,
                           out_w: Int, out_h: Int)
  def resize(assets: Dataset[Asset], box: Int): Dataset[Resized] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val m = StubCodec.parseHeader(a.payload)
        val (ow, oh) = StubCodec.fitWithin(m.width, m.height, box)
        Resized(a.asset_id, m.width, m.height, ow, oh)
      }
    }
  }

  def decodeMeta(assets: Dataset[Asset]): Dataset[DecodedMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // per-partition decoder init would happen here (once per task)
      it.map { a =>
        val m = StubCodec.parseHeader(a.payload)
        DecodedMeta(a.asset_id, a.kind, m.width, m.height, m.nFrames, a.payload.length)
      }
    }
  }

  /** Frame sampling: one row per (asset, sampled frame), feature extracted
    * inside the same partition pass. */
  def sampleFrames(assets: Dataset[Asset], stride: Int = 1): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val m = StubCodec.parseHeader(a.payload)
        (0 until m.nFrames by stride).iterator.map { f =>
          Frame(a.asset_id, f, StubCodec.frameFeature(a.payload, f))
        }
      }
    }
  }

  /** Deterministic fake assets for tests (payload = sha256 bytes of the id). */
  def synthAssets(spark: SparkSession, n: Long): Dataset[Asset] = {
    import spark.implicits._
    spark.range(0, n, 1, 4).map { i =>
      val payload = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s"asset:$i".getBytes("UTF-8"))
      Asset(i, if (i % 2 == 0) "image" else "video", payload)
    }
  }
}
