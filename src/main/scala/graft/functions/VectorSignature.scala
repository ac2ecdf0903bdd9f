package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Random-hyperplane LSH signature as a single Catalyst expression:
 * for a vector v and a literal plane matrix P (nBits x dim), returns a
 * long whose bit b is sign(v . P[b]).
 *
 * Why a custom Expression (SURVEY §7 preference order (b)): composing
 * this from `zip_with`/`aggregate` costs nBits interpreted
 * higher-order-function evaluations per row; here the whole signature
 * is one tight compiled loop over the vector, and `doGenCode` keeps
 * the surrounding projection inside whole-stage codegen (the plane
 * matrix rides along as a codegen reference object).
 */
case class VectorSignature(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))

  // a 65th plane's `1L << 64` would wrap onto bit 0 (shift mod 64) and
  // silently alias different planes into the same signature bit —
  // false LSH collisions with no error (review r04)
  require(planes.length <= 64,
    s"VectorSignature packs bits into one Long: at most 64 planes, got ${planes.length}")

  override def dataType: DataType = LongType
  override def prettyName: String = "vector_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toDoubleArray()
    var sig = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var dot = 0.0
      var d = 0
      val n = math.min(arr.length, p.length)
      while (d < n) { dot += arr(d) * p(d); d += 1 }
      if (dot > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      s"""
         |long $sig = 0L;
         |for (int $b = 0; $b < $p.length; $b++) {
         |  double[] $row = $p[$b];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $a.getDouble($d) * $row[$d];
         |  }
         |  if ($dot > 0) $sig |= 1L << $b;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VectorSignature =
    copy(child = newChild)
}

object VectorSignature {
  /** Column wrapper: `VectorSignature($"embedding_as_double_array", planes)`.
    * Spark 4's Column no longer exposes `.expr`; the classic
    * ExpressionUtils bridge converts both ways. */
  def apply(c: Column, planes: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VectorSignature(GraftColumnBridge.expression(c), planes))
  }
}
