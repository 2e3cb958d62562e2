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

  test("metadata-only query does not require payload decode to fail on short rows") {
    // schema-level: payload stays binary, metadata queries select around it
    val df = assets.toDF().select($"asset_id", $"kind")
    assert(df.count() == 50)
  }
}
