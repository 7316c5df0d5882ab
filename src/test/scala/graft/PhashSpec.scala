package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Block-mean perceptual hash: locality (small edits → small Hamming
  * distance, unrelated payloads → large), pigeonhole recall vs brute
  * force, and determinism.
  */
class PhashSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def mkDocs(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  // deterministic "payload": repeatable pseudo-random letters
  private def payload(seed: Long, n: Int): String =
    (0 until n).map(i => ('a' + ((seed * 6364136223846793005L + i * 1442695040888963407L) >>> 40) % 26).toChar).mkString

  test("a small local edit stays within hd<=12; unrelated payloads land far apart") {
    val base    = payload(1L, 600)
    val edited  = base.substring(0, 300) + "XYZXYZ" + base.substring(306) // 6-char local change
    val other   = payload(2L, 600)
    val hashes  = Multimodal.perceptualHashes(mkDocs(Seq((1L, base), (2L, edited), (3L, other))))
    val m       = hashes.as[(Long, Long)].collect().toMap
    def hd(a: Long, b: Long): Int = java.lang.Long.bitCount(m(a) ^ m(b))
    assert(hd(1L, 2L) <= 12, s"near-dup pair too far: hd=${hd(1L, 2L)}")
    assert(hd(1L, 3L) > 12, s"unrelated pair too close: hd=${hd(1L, 3L)}")
  }

  test("pigeonhole candidates find every brute-force pair at hd<=12") {
    val docs = (1L to 40L).map { i =>
      // 4 families of similar payloads + noise edits
      val fam  = i % 4
      val base = payload(fam, 500)
      val t    = base.substring(0, (i * 7 % 400).toInt) + s"EDIT$i" + base.substring((i * 7 % 400).toInt)
      (i, t)
    }
    val hashes = Multimodal.perceptualHashes(mkDocs(docs))
    val m      = hashes.as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- m.keys; b <- m.keys if a < b
      if java.lang.Long.bitCount(m(a) ^ m(b)) <= 12
    } yield (a, b)).toSet
    val got = Multimodal
      .perceptualNearDup(hashes)
      .select("a", "b")
      .as[(Long, Long)]
      .collect()
      .toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("hash is a function of content only: repartitioned input gives identical fingerprints") {
    val docs = mkDocs((1L to 20L).map(i => (i, payload(i, 300))))
    val h1   = Multimodal.perceptualHashes(docs).as[(Long, Long)].collect().toMap
    val h2   = Multimodal.perceptualHashes(docs.repartition(13)).as[(Long, Long)].collect().toMap
    assert(h1 == h2)
  }
}
