package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row clipped character-n-gram statistics for generation metrics
  * (chrF, BLEU-style precision): both sides of the clip live in the SAME
  * row — the candidate and reference strings of one segment — so the
  * multiset intersection
  *
  *   match_n = Σ_gram min(cnt_cand(gram), cnt_ref(gram))
  *
  * needs no per-gram rows at all. The previous shape exploded every
  * occurrence of every gram order into a (pair, n, gram) stream and
  * hash-aggregated it — ~2·Σ|doc|·maxN shuffled rows, the dominant cost
  * of the chrF query and a corpus-sized shuffle at 100 TB. This kernel
  * computes the whole (match, c_total, r_total) triple in one `compute`
  * call per (row, n): count the candidate's grams into a hash map
  * (zero-copy UTF8String slices over one boundary walk, the
  * CharShingles discipline), then walk the reference's grams decrementing
  * — the decrement-walk total IS the clipped match. The only shuffle
  * left downstream is the |groups|·maxN-row aggregate.
  *
  * Exact parity contract: gram = `substring(s, i, k)` code-point
  * semantics (one UTF-8 sequence = one character), totals =
  * max(0, chars − k + 1) per side — the spelling the DuckDB oracle
  * replays. Returns struct(match_n, c_total, r_total); never null
  * fields. */
case class CharGramClipStats(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  require(k > 0, s"gram size must be positive, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("match_n", LongType, nullable = false),
    StructField("c_total", LongType, nullable = false),
    StructField("r_total", LongType, nullable = false)))
  override def prettyName: String = "char_gram_clip"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string)")
    }

  override def nullSafeEval(cand: Any, ref: Any): Any =
    compute(cand.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charGramClip", this,
      classOf[CharGramClipStats].getName)
    defineCodeGen(ctx, ev, (c, r) => s"$ref.compute($c, $r)")
  }

  // byte offsets of code-point boundaries (starts(chars) = total bytes);
  // returns the char count, filling `starts` (caller sizes it n + 1)
  private def boundaries(bytes: Array[Byte], starts: Array[Int]): Int = {
    var chars = 0
    var i = 0
    while (i < bytes.length) {
      starts(chars) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      chars += 1
    }
    starts(chars) = bytes.length
    chars
  }

  def compute(cand: UTF8String, ref: UTF8String): InternalRow = {
    val cb = cand.getBytes
    val rb = ref.getBytes
    val cStarts = new Array[Int](cb.length + 1)
    val rStarts = new Array[Int](rb.length + 1)
    val cChars = boundaries(cb, cStarts)
    val rChars = boundaries(rb, rStarts)
    val cTotal = math.max(0, cChars - k + 1)
    val rTotal = math.max(0, rChars - k + 1)
    var matchN = 0L
    if (cTotal > 0 && rTotal > 0) {
      // zero-copy slices: fromBytes wraps the backing array, and
      // UTF8String equality/hashCode act on the range — no copies
      val counts = new java.util.HashMap[UTF8String, Array[Int]](cTotal * 2)
      var i = 0
      while (i < cTotal) {
        val g = UTF8String.fromBytes(cb, cStarts(i), cStarts(i + k) - cStarts(i))
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1)) else c(0) += 1
        i += 1
      }
      var j = 0
      while (j < rTotal) {
        val g = UTF8String.fromBytes(rb, rStarts(j), rStarts(j + k) - rStarts(j))
        val c = counts.get(g)
        if (c != null && c(0) > 0) { c(0) -= 1; matchN += 1L }
        j += 1
      }
    }
    new GenericInternalRow(Array[Any](matchN, cTotal.toLong, rTotal.toLong))
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}
