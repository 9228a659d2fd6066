package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles of a token array in one tight loop.
  *
  * Exact parity with the declarative spelling
  * `when(size(tok) >= k, transform(sequence(0, size-k),
  *   i => concat_ws(" ", element_at(tok, i+1) ... element_at(tok, i+k))))
  *  .otherwise(array())`
  * — including concat_ws's null-skipping, via the same
  * `UTF8String.concatWs` kernel — but without the interpreted
  * higher-order-function lambdas, which re-enter the expression
  * interpreter per shingle element (the q101 explode of 5-shingles at
  * sf0.1 spent ~8s in that interpretation; this expression is one
  * `compute` call per row and keeps the stage whole-stage-compiled).
  *
  * Returns array<string>; empty array when the doc has fewer than `k`
  * tokens.
  */
case class WordShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  private val sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - k + 1)
    i = 0
    while (i + k <= n) {
      // concatWs skips nulls exactly like the SQL concat_ws
      out(i) = UTF8String.concatWs(sep,
        java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
