package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup operator properties on the deterministic testdata. */
class DedupSpec extends SparkSpec {

  lazy val docs = Tables.documents(spark, sfDir)

  test("exactDedup keeps one row per distinct text, keeper = min doc_id") {
    val deduped = Dedup.exactDedup(docs)
    val nTexts  = docs.select("text").distinct().count()
    assert(deduped.count() == nTexts)
    // keeper must be the min doc_id of its text group
    val viol = deduped
      .alias("d")
      .join(docs.alias("o"), expr("d.text = o.text AND o.doc_id < d.doc_id"), "inner")
      .count()
    assert(viol == 0, "a kept row has a smaller-doc_id duplicate")
  }

  test("minhash-LSH candidates ⊇ high-jaccard pairs (recall on near-dups)") {
    val exact = Dedup
      .ngramJaccardPairs(docs, k = 3, threshold = 0.7)
      .select("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Dedup
      .minhashNearDups(docs, k = 3, numHashes = 64, bands = 16, threshold = 0.5)
      .select("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val missed = exact -- lsh
    // 16 bands × 4 rows: P(candidate | j=0.7) = 1-(1-0.7^4)^16 ≈ 0.99
    assert(
      missed.size <= math.max(1, exact.size / 10),
      s"LSH missed ${missed.size} of ${exact.size} true near-dup pairs: $missed"
    )
  }

  test("simhash of identical texts is identical; hamming to itself is 0") {
    val sigs = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val textOf = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val byText = textOf.groupBy(_._2).values.filter(_.size > 1)
    byText.foreach { grp =>
      val ids = grp.keys.toSeq
      assert(ids.map(sigs).distinct.size == 1, s"same text, different simhash: $ids")
    }
  }

  test("connected components: edges stay within a component, label is the min member") {
    val pairs = Dedup.ngramJaccardPairs(docs, k = 3, threshold = 0.5).select("a", "b")
    val comp = Dedup
      .connectedComponents(pairs)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    val edges = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) => assert(comp(a) == comp(b), s"edge ($a,$b) crosses components") }
    comp.groupBy(_._2).foreach { case (label, members) =>
      assert(label == members.keys.min, s"component $label labeled by non-min member")
    }
  }

  test("embedding near-dup pairs are symmetric-free (a < b) and above threshold") {
    val rows = Dedup.embeddingNearDups(spark, sfDir, 0.4).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(2) >= 0.4)
    }
  }
}
