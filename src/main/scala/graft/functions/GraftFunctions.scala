package graft.functions

import org.apache.spark.sql.{GraftSessionBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * SQL surface for the engine's custom Catalyst kernels.
 *
 * Everything in `graft.functions` is a compiled Expression usable from
 * the Column API; this object additionally registers each one in a
 * session's FunctionRegistry so the SAME kernels are callable from
 * `spark.sql(...)` — the idiomatic Spark extension route
 * (SURVEY §7 preference order (b) + SparkSessionExtensions):
 *
 *  - `vec_dot(a, b)`        — codegen'd dot product ([[VecDot]])
 *  - `vec_norm(a)`          — codegen'd L2 norm ([[VecNorm]])
 *  - `vec_cosine(a, b)`     — vec_dot(a,b) / (vec_norm(a) * vec_norm(b)),
 *                             composed at plan time, so the whole score
 *                             stays inside one codegen'd projection
 *  - `ts_bucket(ts, dur[, align])` — the reference's floor-modulo
 *                             bucket start (reference src/tsdb.h:84-99),
 *                             composed from built-in arithmetic
 *                             (ts - pmod(ts - align, dur)) so Catalyst
 *                             folds/pushes it like any native expression
 *  - `nearest_centroid(v, matrix)`  — IVF coarse assignment
 *                             ([[NearestCentroid]]); matrix must be a
 *                             foldable array<array<double>> literal,
 *                             extracted at plan time into the compiled
 *                             kernel's reference object
 *  - `vector_signature(v, planes)`  — random-hyperplane LSH signature
 *                             ([[VectorSignature]]), same literal-matrix
 *                             contract (≤ 64 planes)
 *
 * Two registration routes, same builder list:
 *  - [[GraftExtensions]] for session build time
 *    (`spark.sql.extensions=graft.functions.GraftExtensions`);
 *  - [[GraftFunctions.register]] for a live session (the driver
 *    contract hands queries an already-built session).
 */
object GraftFunctions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftFunctions.getClass.getName, null, name)

  private def nargs(fn: String, allowed: Seq[Int], args: Seq[Expression]): Unit =
    require(allowed.contains(args.length),
      s"$fn expects ${allowed.mkString(" or ")} argument(s), got ${args.length}")

  /** Extract a foldable array<array<double>> argument into the plain
    * matrix the compiled kernels carry as a codegen reference object.
    * Plan-time: a non-literal matrix is a loud error, not a per-row
    * re-evaluation. */
  private def literalMatrix(fn: String, e: Expression): Array[Array[Double]] = {
    require(e.foldable,
      s"$fn: the matrix argument must be a literal (foldable) array<array<double>>")
    e.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => ()
      case other => throw new IllegalArgumentException(
        s"$fn: the matrix argument must have type array<array<double>>, got ${other.sql}")
    }
    val ad = e.eval(null).asInstanceOf[ArrayData]
    require(ad != null, s"$fn: the matrix literal must not be null")
    Array.tabulate(ad.numElements()) { i =>
      val row = ad.getArray(i)
      require(row != null, s"$fn: matrix row $i is null")
      row.toDoubleArray()
    }
  }

  /** The full builder list — one entry per SQL-visible kernel. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    (FunctionIdentifier("vec_dot"), info("vec_dot"), { args: Seq[Expression] =>
      nargs("vec_dot", Seq(2), args)
      VecDot(args(0), args(1))
    }),
    (FunctionIdentifier("vec_norm"), info("vec_norm"), { args: Seq[Expression] =>
      nargs("vec_norm", Seq(1), args)
      VecNorm(args.head)
    }),
    (FunctionIdentifier("vec_cosine"), info("vec_cosine"), { args: Seq[Expression] =>
      nargs("vec_cosine", Seq(2), args)
      // dot / (norm(a) * norm(b)) — same association as the Column-API
      // scorers (Similarity.bruteForceTopK), so results hash-match.
      Divide(VecDot(args(0), args(1)),
        Multiply(VecNorm(args(0)), VecNorm(args(1))))
    }),
    (FunctionIdentifier("ts_bucket"), info("ts_bucket"), { args: Seq[Expression] =>
      nargs("ts_bucket", Seq(2, 3), args)
      val ts = args(0)
      val dur = args(1)
      val align = if (args.length == 3) args(2) else Literal(0L)
      // bucket(ts) = ts - pmod(ts - align, dur): floor-modulo bucket
      // start, negative-safe — identical to TSModel.bucketStart.
      Subtract(ts, Pmod(Subtract(ts, align), dur))
    }),
    (FunctionIdentifier("nearest_centroid"), info("nearest_centroid"), { args: Seq[Expression] =>
      nargs("nearest_centroid", Seq(2), args)
      NearestCentroid(args(0), literalMatrix("nearest_centroid", args(1)))
    }),
    (FunctionIdentifier("vector_signature"), info("vector_signature"), { args: Seq[Expression] =>
      nargs("vector_signature", Seq(2), args)
      VectorSignature(args(0), literalMatrix("vector_signature", args(1)))
    })
  )

  /** Register every kernel on a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val registry = GraftSessionBridge.functionRegistry(spark)
    all.foreach { case (id, inf, builder) =>
      if (!registry.functionExists(id)) registry.registerFunction(id, inf, builder)
    }
  }
}

/** Session-build-time injector:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
