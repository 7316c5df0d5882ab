package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass shingle hashing: text → array of 64-bit k-gram hashes.
  *
  * Tokenizes on non-letter code points (identical semantics to the
  * engine's `[^\p{L}]+` split — Character.isLetter covers exactly
  * Unicode category L), hashes each token with a splitmix-finalized
  * rolling hash, and combines k consecutive token hashes
  * position-sensitively. Replaces a 4-stage interpreted pipeline
  * (split → filter → transform → windowed transform) with one
  * expression whose body is a static Java method call, so the row
  * never leaves whole-stage codegen and no intermediate string arrays
  * materialize.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 16, s"k in [1,16], got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object ShingleHashes {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Per-token 64-bit hashes in one scan of the text. */
  private def tokenHashesOf(text: UTF8String): java.util.ArrayList[java.lang.Long] = {
    val s = text.toString
    val tokenHashes = new java.util.ArrayList[java.lang.Long](64)
    var h       = 0L
    var inTok   = false
    var i       = 0
    val n       = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        h = h * 1099511628211L + cp
        inTok = true
      } else if (inTok) {
        tokenHashes.add(mix(h)); h = 0L; inTok = false
      }
      i += Character.charCount(cp)
    }
    if (inTok) tokenHashes.add(mix(h))
    tokenHashes
  }

  /** Static entry point callable from generated Java. */
  def compute(text: UTF8String, k: Int): ArrayData = {
    val tokenHashes = tokenHashesOf(text)
    val t = tokenHashes.size()
    if (t < k) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](t - k + 1)
    var j   = 0
    while (j <= t - k) {
      var acc = 0L
      var d   = 0
      while (d < k) { acc = acc * 1099511628211L + tokenHashes.get(j + d); d += 1 }
      out(j) = mix(acc)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Streaming variant for [[ShingleHashesGen]]: same hashes, emitted
    * one row at a time without materializing the shingle array.
    */
  def stream(text: UTF8String, k: Int): Iterator[org.apache.spark.sql.catalyst.InternalRow] = {
    val tokenHashes = tokenHashesOf(text)
    val t           = tokenHashes.size()
    if (t < k) Iterator.empty
    else
      new Iterator[org.apache.spark.sql.catalyst.InternalRow] {
        private var j            = 0
        override def hasNext: Boolean = j <= t - k
        override def next(): org.apache.spark.sql.catalyst.InternalRow = {
          var acc = 0L
          var d   = 0
          while (d < k) { acc = acc * 1099511628211L + tokenHashes.get(j + d); d += 1 }
          j += 1
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](mix(acc)))
        }
      }
  }
}

/** The `Generator` rung of the extension ladder: the same shingle
  * hashing as [[ShingleHashes]], but as a table-generating function —
  * each input row streams its (t − k + 1) shingle rows directly into
  * the downstream iterator instead of first materializing the full
  * hash array that `explode` then walks.
  *
  * Trade-off (measured, see DedupSpec): a custom Generator cannot join
  * whole-stage codegen — GenerateExec only codegens the built-in
  * CollectionGenerators — so this path pays interpreted row handoff
  * but saves the per-document array allocation. The array+explode path
  * stays fully codegen'd. [[graft.operators.Dedup.hashedShingles]]
  * wires the faster of the two; this node exists because per-row
  * output amplification (a 1 MB document emits ~10⁵ shingle rows) is
  * exactly the case where streaming bounds memory and the array does
  * not.
  */
case class ShingleHashesGen(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 1 && k <= 16, s"k in [1,16], got $k")

  override def elementSchema: StructType =
    StructType(StructField("sh_base", LongType, nullable = false) :: Nil)

  override def prettyName: String = "shingle_hash_stream"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else ShingleHashes.stream(t.asInstanceOf[UTF8String], k)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}
