package graft

import graft.operators.Multimodal

/** Multimodal plumbing: binary transport + stubbed decode must be
  * deterministic and schema-correct.
  */
class MultimodalSpec extends SparkSpec {

  test("extractMeta is deterministic and byte-faithful") {
    val a = Multimodal.extractMeta(spark, sfDir).collect().sortBy(_.doc_id)
    val b = Multimodal.extractMeta(spark, sfDir).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "stub decoder must be deterministic")
    // ASCII corpus: payload bytes == n_chars column
    val nChars = Tables.documents(spark, sfDir).collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    a.foreach(m => assert(m.n_bytes == nChars(m.doc_id)))
    // modality typing
    a.foreach { m =>
      m.media_type match {
        case "image" => assert(m.width > 0 && m.height > 0 && m.duration_ms == 0)
        case "audio" => assert(m.width == 0 && m.duration_ms > 0)
        case "video" => assert(m.width > 0 && m.duration_ms > 0)
      }
    }
  }

  test("stub embedder feeds the ANN index path end-to-end") {
    val emb = Multimodal.embedMedia(spark, sfDir).cache()
    val first = emb.orderBy("vec_id").head()
    assert(first.getSeq[Float](1).length == 64)
    // unit-norm
    val norm = first.getSeq[Float](1).map(x => x.toDouble * x).sum
    assert(math.abs(norm - 1.0) < 1e-5)
    // deterministic
    val again = Multimodal.embedMedia(spark, sfDir).orderBy("vec_id").head()
    assert(first.getSeq[Float](1) == again.getSeq[Float](1))
    // indexable by the hyperplane coder (decode -> featurize -> index)
    val coded = graft.operators.Similarity.hyperplaneCodes(emb, 16)
    assert(coded.select("lsh_code").distinct().count() > 1)
  }

  test("frame sampling only emits for video rows, stride respected") {
    val frames = Multimodal.sampleFrames(spark, sfDir, stride = 10).collect()
    assert(frames.nonEmpty)
    val videoIds = Multimodal.extractMeta(spark, sfDir).filter(_.media_type == "video").collect().map(_.doc_id).toSet
    frames.foreach { r =>
      assert(videoIds.contains(r.getLong(0)))
      assert(r.getLong(1) % 10 == 0)
    }
  }
}
