package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def assets = {
    import spark.implicits._
    (0L until 10L).map(i =>
      Asset(i, Seq("image", "audio", "video")(i.toInt % 3),
        Array.tabulate[Byte]((i * 13 + 5).toInt)(j => (j * 7 + i).toByte), Map("src" -> s"s$i"))
    ).toDS()
  }

  test("decode is deterministic and total over all kinds") {
    val d1 = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    val d2 = Multimodal.decode(Multimodal.repartitionByKind(assets)).collect().sortBy(_.asset_id)
    assert(d1.toSeq == d2.toSeq) // partitioning must not change results
    assert(d1.length == 10)
    assert(d1.forall(d => d.width >= 16 && d.height >= 16 && (1 to 3).contains(d.channels)))
    assert(d1.filter(_.kind != "video").forall(_.n_frames == 1))
  }

  test("frame sampling strides over video frames only") {
    val frames = Multimodal.sampleFrames(assets, stride = 2).collect()
    assert(frames.nonEmpty)
    val byAsset = frames.groupBy(_.asset_id)
    // only kind == video (asset_id % 3 == 2)
    assert(byAsset.keySet.forall(_ % 3 == 2))
    frames.foreach { f =>
      assert(f.frame_idx % 2 == 0)
      assert(f.frame_bytes.length <= 8)
    }
  }

  test("sampleFrames kind filter is a Column predicate below the deserializer (100 TB path)") {
    // over the parquet-backed asset adapter the kind filter must not be a
    // typed lambda (TypedFilter), which would force deserializing every
    // asset (binary payload included) before dropping non-videos
    val ds = Multimodal.sampleFrames(
      Multimodal.documentsAsAssets(spark, "/root/testdata/sf0.001"), stride = 2)
    val optimized = ds.queryExecution.optimizedPlan.toString()
    assert(!optimized.contains("TypedFilter"), optimized)
    // the filter collapses into the scan-side projection: the plan's
    // Filter sits on the relation, not above a DeserializeToObject
    val idxFilter = optimized.indexOf("Filter ")
    val idxDeser = optimized.indexOf("DeserializeToObject")
    assert(idxFilter >= 0 && (idxDeser == -1 || idxFilter > idxDeser), optimized)
  }

  test("resize clamps dims to the box, output bytes bounded and deterministic") {
    val r1 = Multimodal.resize(assets, 32, 32).collect().sortBy(_.asset_id)
    val r2 = Multimodal.resize(assets, 32, 32).collect().sortBy(_.asset_id)
    assert(r1.length == 10)
    r1.foreach { r =>
      assert(r.out_w <= 32 && r.out_h <= 32 && r.out_w >= 1 && r.out_h >= 1)
      assert(r.n_out == r.resized_bytes.length)
      assert(r.n_out <= r.out_w.toLong * r.out_h * 3)
    }
    assert(r1.zip(r2).forall { case (x, y) => x.resized_bytes.sameElements(y.resized_bytes) })
    // a no-op box (huge target) keeps the decoded dims
    val big = Multimodal.resize(assets, 1000, 1000).collect().sortBy(_.asset_id)
    val dec = Multimodal.decode(assets).collect().sortBy(_.asset_id)
    big.zip(dec).foreach { case (r, d) =>
      assert(r.out_w == d.width && r.out_h == d.height)
    }
  }

  test("audio windows: 50% overlap tiling covers every sample exactly") {
    val ws = Multimodal.audioWindows(assets, len = 16, hop = 8).collect()
      .groupBy(_.asset_id)
    assert(ws.nonEmpty)
    // recompute from the same stub decode (code points of the UTF-8
    // payload — binary fixture bytes land on U+FFFD, which is fine: the
    // contract is over the decoded sample stream, whatever it is)
    val samples = assets.collect().filter(_.kind == "audio").map { a =>
      a.asset_id ->
        new String(a.bytes, java.nio.charset.StandardCharsets.UTF_8).codePoints().toArray
    }.toMap
    assert(ws.keySet == samples.filter(_._2.nonEmpty).keySet)
    ws.foreach { case (id, rows) =>
      val cps = samples(id)
      val sorted = rows.sortBy(_.window_idx)
      assert(sorted.map(_.window_idx).toSeq == sorted.indices.toSeq)
      assert(sorted.length == math.ceil(cps.length / 8.0).toInt)
      sorted.foreach { w =>
        val slice = cps.slice(w.window_idx * 8, w.window_idx * 8 + 16)
        assert(w.n_samples == slice.length)
        assert(w.energy == slice.map(_.toLong).sum)
        assert(w.peak == slice.max.toLong)
      }
    }
  }

  test("feature extraction: fixed dim, deterministic, [0,1) range") {
    val f1 = Multimodal.extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, dim = 8).collect().sortBy(_.asset_id)
    assert(f1.length == 10)
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(_.features.forall(v => v >= 0f && v < 1f)))
  }
}
