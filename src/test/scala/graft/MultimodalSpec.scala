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

  test("histogram embedder: exact token mass, deterministic, ANN path end-to-end") {
    import org.apache.spark.sql.functions._
    val emb   = Multimodal.embedMedia(spark, sfDir).cache()
    val first = emb.orderBy("vec_id").head()
    assert(first.getSeq[Float](1).length == 64)
    // histogram mass == the doc's token count (content tie, not shape)
    val docTokens = Tables
      .documents(spark, sfDir)
      .orderBy("doc_id")
      .select(expr("size(filter(split(text, '[^\\\\p{L}]+'), t -> t <> ''))"))
      .head()
      .getInt(0)
    assert(first.getSeq[Float](1).map(_.toLong).sum == docTokens.toLong)
    // deterministic
    val again = Multimodal.embedMedia(spark, sfDir).orderBy("vec_id").head()
    assert(first.getSeq[Float](1) == again.getSeq[Float](1))
    // the exploded (oracle) form and the vector form are the same data
    val rows = Multimodal.embedMediaRows(spark, sfDir)
    val reexploded = Multimodal
      .embedMedia(spark, sfDir)
      .select(col("vec_id"), posexplode(col("embedding")))
      .selectExpr("vec_id", "cast(pos as int) as dim_idx", "cast(col as bigint) as cnt")
    assert(rows.exceptAll(reexploded).isEmpty && reexploded.exceptAll(rows).isEmpty)
    // ANN tier end-to-end over the media embeddings: hyperplane-LSH
    // bucket the corpus, then rerank ONLY the query's bucket by exact
    // cosine — self-retrieval must come back at rank 1 with cos ≈ 1
    graft.GraftFunctions.register(spark)
    val coded = graft.operators.Similarity
      .hyperplaneCodes(emb, 16)
      .select("vec_id", "lsh_code")
      .cache()
    assert(coded.select("lsh_code").distinct().count() > 1)
    val probe = coded.join(emb, "vec_id").orderBy("vec_id").limit(1)
      .select(col("vec_id").as("qid"), col("lsh_code").as("qcode"), col("embedding").as("qe"))
    val top = coded
      .join(emb, "vec_id")
      .join(broadcast(probe), col("lsh_code") === col("qcode"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .orderBy(col("cos").desc, col("vec_id"))
      .select("vec_id", "cos")
      .head()
    assert(top.getLong(0) == probe.head().getLong(0), "self-retrieval through the LSH bucket must rank first")
    assert(math.abs(top.getDouble(1) - 1.0) < 1e-6)
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

  test("shotBoundaries: frame counts match the sampler, shots in [1, n_frames], model recompute agrees") {
    import SparkSpec.spark.implicits._
    val shots = graft.operators.Multimodal
      .shotBoundaries(spark, sfDir)
      .as[(Long, Long, Long)]
      .collect()
    assert(shots.nonEmpty)
    val framesPerDoc = graft.operators.Multimodal
      .sampleFrames(spark, sfDir)
      .groupBy("doc_id")
      .count()
      .as[(Long, Long)]
      .collect()
      .toMap
    shots.foreach { case (id, nf, ns) =>
      assert(nf == framesPerDoc(id), s"doc $id frame count must match the sampler")
      assert(ns >= 1 && ns <= nf, s"doc $id: shots $ns out of [1, $nf]")
    }
    assert(shots.map(_._3).sum > shots.length, "the corpus must contain at least one real cut")
    // pure-Scala recompute for the three largest docs
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h60(s: String): Long = java.lang.Long.parseLong(md5hex(s).take(15), 16)
    val texts = Tables
      .documents(spark, sfDir)
      .filter(
        org.apache.spark.sql.functions.col("doc_id") % 3 === 2 &&
          org.apache.spark.sql.functions.col("text").isNotNull
      )
      .select("doc_id", "text")
      .as[(Long, String)]
      .collect()
      .toMap
    shots.sortBy(-_._2).take(3).foreach { case (id, nf, ns) =>
      val t     = texts(id)
      val dur   = 1000L + h60(t) % 600000L
      val idxs  = 0L.until(dur / 40L, 10L)
      val sigs  = idxs.map(i => h60(s"$t#$i"))
      val cuts  = sigs.sliding(2).count { case Seq(a, b) => java.lang.Long.bitCount(a ^ b) > 38; case _ => false }
      assert(nf == idxs.size.toLong && ns == cuts + 1L, s"doc $id model mismatch")
    }
  }
}
