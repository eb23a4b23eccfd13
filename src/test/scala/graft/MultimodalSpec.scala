package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("asMedia tags modalities and carries binary payloads") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val rows = media.collect()
    assert(rows.length === docs.count())
    assert(rows.forall(r => Set("image", "audio", "video")(r.modality)))
    assert(rows.forall(_.payload.nonEmpty))
    val byId = rows.map(r => r.id -> r.modality).toMap
    assert(byId(0L) === "image" && byId(1L) === "audio" && byId(2L) === "video")
  }

  test("extractFeatures is deterministic, partitioned, and schema-stable") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, partitions = 4)
    assert(feats.rdd.getNumPartitions === 4)
    assert(feats.columns.toSeq ===
      Seq("id", "modality", "n_bytes", "width", "height", "n_frames", "checksum"))
    val a = feats.collect().sortBy(_.id)
    val b = Multimodal.extractFeatures(media, partitions = 4).collect().sortBy(_.id)
    assert(a.toSeq === b.toSeq)
    assert(a.forall(f => f.width >= 64 && f.height >= 64 && f.n_bytes > 0))
    assert(a.filter(_.modality != "video").forall(_.n_frames === 1))
  }

  test("sampleFrames explodes every step-th frame for videos only") {
    val media = Multimodal.asMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, partitions = 4)
    val frames = Multimodal.sampleFrames(feats, step = 10).collect()
    assert(frames.forall(_.getLong(0) % 3 === 2)) // only video ids (id%3==2)
    val perId = frames.groupBy(_.getLong(0))
    val expected = feats.collect().filter(_.modality == "video")
      .map(f => f.id -> (1 + (f.n_frames - 1) / 10)).toMap
    assert(perId.view.mapValues(_.length).toMap === expected)
    assert(frames.forall(_.getInt(2) % 10 === 0))
  }
}
