package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/**
 * IVF coarse-quantizer assignment as a single Catalyst expression: for
 * a vector v and a literal matrix of UNIT-NORM centroids, returns the
 * index of the centroid with the largest dot product (= largest cosine,
 * since v's own norm is constant across candidates). Ties break to the
 * lowest centroid id.
 *
 * Why a custom Expression (SURVEY §7 preference order (b)): the
 * alternative is a crossJoin against the centroid table followed by a
 * groupBy(vec_id) argmax — a nCentroids× row blowup and a full-corpus
 * shuffle carrying embeddings. Here assignment is one compiled
 * projection: zero shuffle, zero blowup, and at 100 TB the corpus can
 * be written out bucketed by the resulting cluster id for
 * partition-pruned probes.
 */
case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toDoubleArray()
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      var dot = 0.0
      var d = 0
      val n = math.min(arr.length, cv.length)
      while (d < n) { dot += arr(d) * cv(d); d += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      s"""
         |int $best = 0;
         |double $bestDot = java.lang.Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cs.length; $c++) {
         |  double[] $row = $cs[$c];
         |  int $n = java.lang.Math.min($a.numElements(), $row.length);
         |  double $dot = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $a.getDouble($d) * $row[$d];
         |  }
         |  if ($dot > $bestDot) { $bestDot = $dot; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {
  def apply(c: Column, centroids: Array[Array[Double]]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(NearestCentroid(GraftColumnBridge.expression(c), centroids))
  }
}
