package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Vector dot product as a native codegen'd Catalyst expression.
 *
 * Spark's higher-order functions (`aggregate(zip_with(a,b,*),0,+)`)
 * stay interpreted — each row allocates a lambda-variable frame per
 * element. Cosine scoring joins (brute-force ANN, IVF probe scoring,
 * LSH candidate verification) evaluate one dot product per candidate
 * pair, which at 100 TB is the innermost loop of the whole job. This
 * expression emits a tight primitive `for` loop into whole-stage
 * codegen — no boxing, no allocation, and the surrounding
 * join/projection stage keeps its single generated function.
 *
 * Summation order is left-to-right, identical to the interpreted
 * `aggregate` composition it replaces, so oracle hashes are unchanged.
 *
 * INPUT CONTRACT: element-non-null arrays of equal length (every
 * caller feeds `CAST(embedding AS ARRAY<DOUBLE>)` from a non-null
 * fixed-dim parquet column). Unlike the zip_with composition — which
 * NULL-propagates a null element and null-pads a length mismatch —
 * this expression reads raw slots and truncates to the shorter length;
 * feeding it ragged or null-holed arrays is out of contract.
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // SQL callers (GraftFunctions) get array<float> -> array<double>
  // coercion from the analyzer instead of a runtime accessor error.
  override def inputTypes =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Euclidean norm `sqrt(v . v)` with the same codegen rationale as
  * [[VecDot]]. */
case class VecNorm(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}

object VecDot {
  def apply(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      VecDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}

object VecNorm {
  def apply(a: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VecNorm(GraftColumnBridge.expression(a)))
  }
}
