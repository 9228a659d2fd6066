package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass MinHash signature over a token array: word `shingleSize`-
  * shingles are hashed incrementally (FNV-1a over token bytes with a
  * separator — identical to hashing the joined string, no string
  * construction), and `nSig` salted minima are maintained simultaneously
  * via a bijective mix per salt.
  *
  * Replaces the per-salt higher-order-function formulation (`transform` +
  * min per salt), whose interpreted lambdas re-walked the shingle array
  * once per salt — this expression is one tight loop per row and took the
  * sf0.1 MinHash-LSH stage from ~10s to subsecond.
  *
  * Returns array<long> of length `nSig`; empty array when the doc has
  * fewer than `shingleSize` tokens (caller filters).
  */
case class MinHashSignature(child: Expression, nSig: Int, shingleSize: Int)
    extends UnaryExpression {

  require(nSig > 0 && shingleSize > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < shingleSize) return new GenericArrayData(Array.empty[Any])
    val tokenBytes = Array.tabulate(n)(i =>
      if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
    val minima = Array.fill(nSig)(Long.MaxValue)
    var i = 0
    while (i + shingleSize <= n) {
      // h = fnv1a64(tok_i ' ' tok_i+1 ' ' ... tok_i+k-1)
      var h = Fnv1a64.Offset
      var j = 0
      while (j < shingleSize) {
        if (j > 0) { h ^= ' '.toLong; h *= Fnv1a64.Prime }
        val b = tokenBytes(i + j)
        var k = 0
        while (k < b.length) { h ^= (b(k) & 0xffL); h *= Fnv1a64.Prime; k += 1 }
        j += 1
      }
      var r = 0
      while (r < nSig) {
        // splitmix64-style bijective mix of (h, salt r) — k independent
        // hash functions from one base hash
        var z = h + 0x9e3779b97f4a7c15L * (r + 1)
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        if (z < minima(r)) minima(r) = z
        r += 1
      }
      i += 1
    }
    new GenericArrayData(minima.map(java.lang.Long.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
