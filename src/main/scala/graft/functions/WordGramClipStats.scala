package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word-gram twin of [[CharGramClipStats]] — per-row clipped word-n-gram
  * statistics over a (candidate tokens, reference tokens) pair:
  *
  *   match_n = Σ_gram min(cnt_cand(gram), cnt_ref(gram))
  *
  * for k-token grams, computed entirely inside the row (count candidate
  * windows into a hash map, walk reference windows decrementing), so
  * BLEU-style precision needs no per-gram rows and no gram shuffle —
  * the 100 TB shape argument of the char kernel verbatim. Gram identity
  * is the token SEQUENCE (keys are token-slice views with sequence
  * equality — no join-string allocation, and exactly the semantics of
  * the `concat_ws`-spelled grams both engines replay: tokens come from
  * a space split, so the joined spelling is injective). Totals are
  * max(0, tokens − k + 1) per side. Null-element-free token arrays are
  * the contract (split() output); returns struct(match_n, c_total,
  * r_total). */
case class WordGramClipStats(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, s"gram size must be positive, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("match_n", LongType, nullable = false),
    StructField("c_total", LongType, nullable = false),
    StructField("r_total", LongType, nullable = false)))
  override def prettyName: String = "word_gram_clip"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<string>)")
    }

  override def nullSafeEval(cand: Any, ref: Any): Any =
    compute(cand.asInstanceOf[ArrayData], ref.asInstanceOf[ArrayData])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordGramClip", this,
      classOf[WordGramClipStats].getName)
    defineCodeGen(ctx, ev, (c, r) => s"$ref.compute($c, $r)")
  }

  private def toks(a: ArrayData): Array[UTF8String] = {
    val n = a.numElements()
    val out = new Array[UTF8String](n)
    var i = 0
    while (i < n) { out(i) = a.getUTF8String(i); i += 1 }
    out
  }

  def compute(cand: ArrayData, ref: ArrayData): InternalRow = {
    val ct = toks(cand)
    val rt = toks(ref)
    val cTotal = math.max(0, ct.length - k + 1)
    val rTotal = math.max(0, rt.length - k + 1)
    var matchN = 0L
    if (cTotal > 0 && rTotal > 0) {
      val counts =
        new java.util.HashMap[WordGramClipStats.Key, Array[Int]](cTotal * 2)
      var i = 0
      while (i < cTotal) {
        val key = new WordGramClipStats.Key(ct, i, k)
        val c = counts.get(key)
        if (c == null) counts.put(key, Array(1)) else c(0) += 1
        i += 1
      }
      var j = 0
      while (j < rTotal) {
        val c = counts.get(new WordGramClipStats.Key(rt, j, k))
        if (c != null && c(0) > 0) { c(0) -= 1; matchN += 1L }
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](matchN, cTotal.toLong, rTotal.toLong))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object WordGramClipStats {
  /** Token-slice view with k-token sequence equality — the gram key. */
  private[functions] final class Key(val toks: Array[UTF8String],
      val start: Int, val k: Int) {
    override def hashCode: Int = {
      var h = 1
      var i = 0
      while (i < k) { h = 31 * h + toks(start + i).hashCode; i += 1 }
      h
    }
    override def equals(o: Any): Boolean = o match {
      case g: Key =>
        if (g.k != k) false
        else {
          var i = 0
          var eq = true
          while (eq && i < k) {
            eq = toks(start + i).equals(g.toks(g.start + i)); i += 1
          }
          eq
        }
      case _ => false
    }
  }
}
