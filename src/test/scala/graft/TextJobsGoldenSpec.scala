package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.operators.TextJobs

/** Golden-output parity for the reference's two jobs (SURVEY.md §5.2.1):
  * goldens computed by an independent plain-Scala oracle over the same
  * corpus, compared as merged key→value maps (order-insensitive per the
  * contract §2.3.4).
  */
class TextJobsGoldenSpec extends SparkSpec {

  private def listFiles(dir: String): Seq[java.nio.file.Path] =
    Files.list(Paths.get(dir)).iterator().asScala.toSeq.sortBy(_.getFileName.toString)

  private def tokens(s: String): Iterator[String] =
    s.split(TextJobs.TokenSep).iterator.filter(_.nonEmpty)

  private def goldenWc(dir: String): Map[String, Long] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    listFiles(dir).foreach { p =>
      tokens(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).foreach(w => m(w) += 1)
    }
    m.toMap
  }

  private def goldenIi(dir: String): Map[String, Seq[String]] = {
    val m = scala.collection.mutable.HashMap.empty[String, Set[String]].withDefaultValue(Set.empty)
    listFiles(dir).foreach { p =>
      val name = p.getFileName.toString
      tokens(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)).foreach(w => m(w) += name)
    }
    m.view.mapValues(_.toSeq.sorted).toMap
  }

  val small = "/root/reference/input/small"
  val large = "/root/reference/input/large"

  test("wc golden parity on small corpus") {
    val got = TextJobs
      .wordCountDir(spark, small)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == goldenWc(small))
  }

  test("ii golden parity on large corpus incl. small⊂large cross-check") {
    val golden = goldenIi(large)
    val got = TextJobs
      .invertedIndexDir(spark, large)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    assert(got.keySet == golden.keySet)
    got.foreach { case (w, (n, files)) =>
      assert(n == golden(w).size, s"n_files mismatch for $w")
      assert(files == golden(w).mkString(","), s"files mismatch for $w")
    }
    // small ⊂ large: words found in small's wc1-3 must list wc4-6 here
    assert(got("the")._2.contains("wc4.txt") && got("the")._2.contains("wc6.txt"))
  }

  test("partition-count invariance (kills the reference's >=10-reducer bug class)") {
    val base = TextJobs.wordCount(operators.TextJobs.corpus(spark, small)).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    Seq(1, 3, 7).foreach { r =>
      val re = TextJobs
        .wordCount(operators.TextJobs.corpus(spark, small).repartition(r))
        .collect()
        .map(x => (x.getString(0), x.getLong(1)))
        .toSet
      assert(re == base, s"repartition($r) changed the merged result")
    }
  }
}
