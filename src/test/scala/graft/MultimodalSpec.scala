package graft

import org.apache.spark.sql.functions._
import graft.operators.{Knn, Multimodal}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.synthesize(
    spark, spark.range(0, 90).toDF("id"), "id").cache()

  test("synthesized media table matches the canonical schema shape") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "payload", "media_type", "meta"))
    val types = media.select("media_type").distinct().as[String].collect().toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("decode stub: deterministic, one row per media") {
    val d1 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val d2 = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(d1.length == 90)
    assert(d1.map(_.pixel_checksum).toSeq == d2.map(_.pixel_checksum).toSeq)
    assert(d1.forall(d => d.width >= 64 && d.height >= 64 && d.channels == 3))
  }

  test("feature stub output feeds Knn directly") {
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
      .select($"media_id", $"feature".cast("array<float>").as("feature"))
    val q = feats.filter($"media_id" === 0).select("feature").head().getSeq[Float](0)
    val r = Knn.search(feats, $"feature", q, 5, "cosine", tieBreak = Some($"media_id"))
      .select($"media_id").as[Long].collect()
    assert(r.head == 0L) // self-match first
    assert(r.length == 5)
  }

  test("resize rewrites metadata, preserves payload") {
    val r = Multimodal.resize(media, 224, 224)
    val m = r.select($"meta.width", $"meta.height", $"meta.sample_rate").head()
    assert(m.getInt(0) == 224 && m.getInt(1) == 224 && m.getInt(2) == 16000)
    assert(r.select("payload").head() == media.select("payload").head())
  }

  test("frame sampling: n frames per video row, flatMap shape") {
    val frames = Multimodal.sampleFrames(media, n = 4)
    val videoCount = media.filter($"media_type" === "video").count()
    assert(frames.count() == videoCount * 4)
    val idxs = frames.toDF().groupBy("media_id")
      .agg(collect_set("frame_idx").as("s"))
      .select("s").head().getSeq[Int](0).sorted
    assert(idxs == Seq(0, 1, 2, 3))
  }
}
