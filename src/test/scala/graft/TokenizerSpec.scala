package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.TextJobs

/** Tokenizer fidelity (SURVEY.md §2.3.1): the engine's `[^\p{L}]+`
  * split must equal the reference's Go unicode.IsLetter FieldsFunc —
  * maximal runs of Unicode category-L code points, no empties.
  */
class TokenizerSpec extends SparkSpec {

  /** Model implementation: character-by-character category-L splitter,
    * the direct transliteration of Go's FieldsFunc(!unicode.IsLetter).
    */
  private def modelTokens(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    s.codePoints().forEach { cp =>
      if (Character.isLetter(cp)) cur.appendAll(Character.toChars(cp))
      else if (cur.nonEmpty) { out += cur.toString; cur.clear() }
    }
    if (cur.nonEmpty) out += cur.toString
    out.toSeq
  }

  private def engineTokens(s: String): Seq[String] =
    s.split(TextJobs.TokenSep).toSeq.filter(_.nonEmpty)

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("engine split == category-L model on arbitrary unicode strings") {
    val weird = Gen.oneOf('a', 'Z', 'é', 'ß', '漢', 'і', '1', '½', '⅔', ' ', '\n', '﻿', '.', '_', '-', '0')
    val gen   = Gen.listOf(weird).map(_.mkString)
    checkProp(Prop.forAll(gen) { s => engineTokens(s) == modelTokens(s) })
    checkProp(Prop.forAll(Gen.asciiPrintableStr) { s => engineTokens(s) == modelTokens(s) })
  }

  test("ShingleHashes' internal tokenizer agrees with the regex tokenizer") {
    // k=1 → one hash per token; counts must match the model on any input
    val gen = Gen
      .listOf(Gen.oneOf("a", "Z", "é", "漢", "𝔘" /* 𝔘 supplementary-plane letter */, "1", "½", " ", "\n", ".", "﻿"))
      .map(_.mkString)
    checkProp(Prop.forAll(gen) { s =>
      graft.functions.ShingleHashes
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), 1)
        .numElements() == modelTokens(s).size
    })
    // identical token streams hash identically; differing ones don't
    val a = graft.functions.ShingleHashes.compute(org.apache.spark.unsafe.types.UTF8String.fromString("foo bar baz"), 2)
    val b = graft.functions.ShingleHashes.compute(org.apache.spark.unsafe.types.UTF8String.fromString("foo-bar!baz"), 2)
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq, "separator choice must not affect shingle hashes")
    val c = graft.functions.ShingleHashes.compute(org.apache.spark.unsafe.types.UTF8String.fromString("foo bar qux"), 2)
    assert(a.toLongArray().toSeq != c.toLongArray().toSeq)
  }

  test("BOM is a separator (pg174.txt case)") {
    assert(engineTokens("﻿The Project") == Seq("The", "Project"))
  }

  test("case-sensitive, digits excluded") {
    assert(engineTokens("The the THE 42 foo42bar") == Seq("The", "the", "THE", "foo", "bar"))
  }
}
