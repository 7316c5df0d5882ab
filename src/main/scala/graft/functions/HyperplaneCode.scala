package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH code as a native codegen expression: bit p of
  * the result is the sign of dot(vec, plane_p), where plane components
  * are derived on the fly from splitmix64(p * 4096 + d) — no plane
  * matrix is materialized or broadcast, and the whole O(planes · dim)
  * loop runs inside whole-stage codegen.
  *
  * The interpreted alternative (nested `transform`/`aggregate` lambdas)
  * is 1-2 orders of magnitude slower and gets re-inlined by
  * CollapseProject into every consumer, multiplying the cost.
  */
case class HyperplaneCode(child: Expression, numPlanes: Int) extends UnaryExpression {

  require(numPlanes >= 1 && numPlanes <= 64, s"numPlanes must be in [1,64], got $numPlanes")

  override def dataType: DataType = LongType

  private def elemIsDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val isD = elemIsDouble
    var code = 0L
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isD) v.getDouble(d) else v.getFloat(d).toDouble
        dot += x * HyperplaneCode.weight(p, d)
        d += 1
      }
      if (dot >= 0.0) code |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(code)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemIsDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"""
        |long code = 0L;
        |int n = $v.numElements();
        |for (int p = 0; p < $numPlanes; p++) {
        |  double dot = 0.0;
        |  for (int d = 0; d < n; d++) {
        |    dot += (double) $v.$getter(d) * graft.functions.HyperplaneCode.weight(p, d);
        |  }
        |  if (dot >= 0.0) code |= (1L << p);
        |}
        |${ev.value} = code;
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(child = newChild)
}

object HyperplaneCode {

  /** Deterministic plane component in [-1, 1): splitmix64 of the
    * (plane, dim) index. Public + static so generated code can call it.
    */
  def weight(p: Int, d: Int): Double = {
    var z = p.toLong * 4096L + d.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11) * (2.0 / (1L << 53)) - 1.0
  }
}
