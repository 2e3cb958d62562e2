package vfsidx.multimodal

import vfsidx.SparkTestBase

class BinaryDecodeSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val assets = BinaryDecode.synthAssets(spark, 50).cache()

  test("metadata decode is deterministic and complete") {
    val metas = BinaryDecode.decodeMeta(assets).collect()
    assert(metas.length == 50)
    val again = BinaryDecode.decodeMeta(assets).collect()
    assert(metas.map(m => (m.asset_id, m.width, m.height, m.n_frames)).toSeq ==
      again.map(m => (m.asset_id, m.width, m.height, m.n_frames)).toSeq)
    assert(metas.forall(m => m.n_frames >= 1 && m.n_frames <= 4 && m.bytes == 32))
  }

  test("frame sampling emits n_frames rows per asset with bounded features") {
    val metas = BinaryDecode.decodeMeta(assets).collect()
      .map(m => m.asset_id -> m.n_frames).toMap
    val frames = BinaryDecode.sampleFrames(assets).collect()
    val byAsset = frames.groupBy(_.asset_id)
    assert(byAsset.keySet == metas.keySet)
    byAsset.foreach { case (id, fs) =>
      assert(fs.length == metas(id))
      assert(fs.forall(_.feature.forall(v => v >= 0f && v <= 1f)))
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until metas(id)).toSeq)
    }
  }

  test("resize preserves aspect ratio within integer truncation and respects the box") {
    val box = 16
    val out = BinaryDecode.resize(assets, box).collect()
    assert(out.length == 50)
    out.foreach { r =>
      assert(r.out_w >= 1 && r.out_h >= 1)
      if (r.width <= box && r.height <= box) {
        assert(r.out_w == r.width && r.out_h == r.height)   // no upscaling
      } else {
        assert(r.out_w <= box && r.out_h <= box)
        assert(r.out_w == box || r.out_h == box)            // long edge hits the box
        // aspect ratio preserved within integer truncation
        val expW = math.max(1, r.width * box / math.max(r.width, r.height))
        val expH = math.max(1, r.height * box / math.max(r.width, r.height))
        assert(r.out_w == expW && r.out_h == expH)
      }
    }
  }

  test("metadata-only query does not require payload decode to fail on short rows") {
    // schema-level: payload stays binary, metadata queries select around it
    val df = assets.toDF().select($"asset_id", $"kind")
    assert(df.count() == 50)
  }
}
