package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-profile stopword hit counts over a token array, in ONE pass.
  *
  * Replaces the per-profile `filter(tok, t -> t IN (...))` higher-order
  * formulation in LangId — HOF lambdas are interpreted (never codegen'd),
  * so five of them re-walked every token list five times in interpreted
  * mode. Here each token does a single hash lookup into a token→profile
  * bitmask map and increments the counts of every profile containing it
  * (profiles are capped at 32 by the bitmask width).
  *
  * Returns array<int> of hit counts aligned with `profiles` order;
  * duplicate tokens count every occurrence — identical semantics to the
  * filter+size composition and to the DuckDB list_filter oracle.
  */
case class StopwordHits(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(profiles.nonEmpty && profiles.size <= 32, "1..32 profiles supported")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "stopword_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    profiles.zipWithIndex.foreach { case (words, p) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf((if (prev == null) 0 else prev.intValue()) | (1 << p)))
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(arr: ArrayData): ArrayData = {
    val counts = new Array[Int](profiles.size)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val mask = masks.get(arr.getUTF8String(i))
        if (mask != null) {
          var m = mask.intValue()
          while (m != 0) {
            val p = java.lang.Integer.numberOfTrailingZeros(m)
            counts(p) += 1
            m &= m - 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(Integer.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
