package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * These run inside whole-stage codegen (tight primitive loops, no
  * boxing, no higher-order-function interpretation), which matters when
  * the surrounding operator is an O(n·k) candidate-scoring loop over
  * millions of pairs — the brute-force and LSH similarity operators in
  * [[graft.operators.Similarity]] put these in their innermost stage.
  *
  * Semantics mirror a sequential left-to-right double-precision
  * accumulation so results are reproducible and match the DuckDB oracle
  * (`list_cosine_similarity` on DOUBLE[]) to within an ulp.
  */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _                                                  => false
    }
    if (ok(left) && ok(right)) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float>/array<double>, got ${left.dataType} / ${right.dataType}"
      )
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aDouble = elemIsDouble(left)
    val bDouble = elemIsDouble(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemIsDouble(left)) "getDouble" else "getFloat"
    val bGet = if (elemIsDouble(right)) "getDouble" else "getFloat"
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double dot = 0.0, na = 0.0, nb = 0.0;
        |for (int i = 0; i < n; i++) {
        |  double x = (double) $a.$aGet(i);
        |  double y = (double) $b.$bGet(i);
        |  dot += x * y; na += x * x; nb += y * y;
        |}
        |${ev.value} = (na == 0.0 || nb == 0.0) ? 0.0 : dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb));
      """.stripMargin
    )
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over float/double arrays; same codegen rationale. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def getter(e: Expression): String = e.dataType match {
    case ArrayType(DoubleType, _) => "getDouble"
    case _                        => "getFloat"
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    val aD = getter(left) == "getDouble"
    val bD = getter(right) == "getDouble"
    var dot = 0.0; var i = 0
    while (i < n) {
      val x = if (aD) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bD) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double dot = 0.0;
        |for (int i = 0; i < n; i++) {
        |  dot += (double) $a.${getter(left)}(i) * (double) $b.${getter(right)}(i);
        |}
        |${ev.value} = dot;
      """.stripMargin
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
