package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Character k-shingles (k-grams) of a string in one boundary-walk pass.
  *
  * Exact parity with the declarative spelling
  * `transform(sequence(1, char_length(s) - k + 1), i -> substring(s, i, k))`
  * (empty array below k characters, code-point character semantics) — but
  * without the per-gram interpreted lambda AND without `substring`'s
  * per-call scan-from-start: that spelling is O(n²) in code points because
  * every `substring(s, i, k)` re-walks the prefix, while this expression
  * records each character's byte offset once and slices bytes directly
  * (O(n) total). The q189 trigram explode at sf0.1 spent ~3.5s in the
  * interpreted HOF; this is one `compute` call per row and keeps the stage
  * whole-stage-compiled.
  *
  * Returns array<string>; empty array when the string has fewer than `k`
  * characters.
  */
case class CharShingles(child: Expression, k: Int) extends UnaryExpression {

  require(k > 0, s"shingle size must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charShingles", this, classOf[CharShingles].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // one pass: byte offset of every code-point boundary (same character
    // semantics as SQL substring — UTF-8 sequence = one character)
    val starts = new Array[Int](n + 1)
    var chars = 0
    var i = 0
    while (i < n) {
      starts(chars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    starts(chars) = n
    if (chars < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - k + 1)
    var j = 0
    while (j + k <= chars) {
      out(j) = UTF8String.fromBytes(bytes, starts(j), starts(j + k) - starts(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
