package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {

  test("synthetic corpus is deterministic and metadata is prunable") {
    val a = MultimodalOps.syntheticCorpus(spark, 30).collect()
    val b = MultimodalOps.syntheticCorpus(spark, 30).collect()
    assert(a.map(_.media_id).sameElements(b.map(_.media_id)))
    assert(a.map(_.content.toSeq).toSeq == b.map(_.content.toSeq).toSeq)
    // metadata predicate prunes without touching bytes
    val imgs = MultimodalOps.syntheticCorpus(spark, 30)
      .filter(col("kind") === "image")
    assert(imgs.count() == 10)
  }

  test("feature extraction: normalized 16-bin histogram per media") {
    val feats = MultimodalOps.extractFeatures(
      MultimodalOps.syntheticCorpus(spark, 30)).collect()
    assert(feats.length == 30)
    feats.foreach { f =>
      assert(f.dim == 16 && f.features.length == 16)
      assert(math.abs(f.features.sum - 1f) < 1e-3,
        s"histogram of ${f.media_id} must normalize to 1")
    }
  }

  test("resize halves image dimensions only") {
    val orig = MultimodalOps.syntheticCorpus(spark, 30).collect()
      .map(r => r.media_id -> r.meta).toMap
    val out = MultimodalOps.resizeHalf(
      MultimodalOps.syntheticCorpus(spark, 30)).collect()
    out.foreach { r =>
      if (r.kind == "image") {
        assert(r.meta.width == orig(r.media_id).width / 2)
        assert(r.meta.height == orig(r.media_id).height / 2)
      } else assert(r.meta == orig(r.media_id))
    }
  }

  test("frame sampling yields duration-proportional frames, concat preserves bytes") {
    val corpus = MultimodalOps.syntheticCorpus(spark, 30)
    val frames = MultimodalOps.sampleFrames(corpus, everyMs = 1000).collect()
    val videos = corpus.filter(col("kind") === "video").collect()
    val byId = frames.groupBy(_.media_id)
    videos.foreach { v =>
      val fs = byId(v.media_id).sortBy(_.frame_idx)
      assert(fs.length == math.max((v.meta.durationMs / 1000).toInt, 1))
      assert(fs.flatMap(_.frame_bytes).sameElements(v.content),
        "frame slices must tile the payload")
    }
  }

  test("pipeline output: one row per media, videos carry frame counts") {
    val out = MultimodalOps.pipeline(spark, 60).collect()
    assert(out.length == 60)
    out.foreach { r =>
      val kind = r.getAs[String]("kind")
      val n = r.getAs[Long]("n_frames")
      if (kind == "video") assert(n > 0) else assert(n == 0)
    }
  }
}
