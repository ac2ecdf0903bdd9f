package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/**
 * Map-side Bloom membership test over a string column — the prefilter
 * behind the two-phase contamination scan ([[graft.pipeline
 * .CorpusPipeline.contaminationBloom]]): a driver-built filter of the
 * benchmark shingle set rides to every task as one compact bit array
 * (8 bits/item at 1% fpp vs the strings themselves), and the corpus
 * stream drops non-members BEFORE any shuffle. No false negatives —
 * every true member passes and the exact join downstream removes the
 * false positives — so the composition's RESULT is bit-identical to
 * the exact operator while its shuffle volume is the survivors only.
 *
 * Why a custom Expression (SURVEY §7 preference order (b)): Spark's
 * own `BloomFilterMightContain` is internal (runtime join filters,
 * binary-serialized filter argument); a Scala UDF would box every row
 * and fall out of whole-stage codegen on the hottest path of the
 * scan. Here `doGenCode` emits one virtual call against a referenced
 * filter object.
 */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    filter.mightContainString(input.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainString($a.toString());"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {
  def apply(c: Column, filter: BloomFilter): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(BloomMightContain(GraftColumnBridge.expression(c), filter))
  }
}
