package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared deterministic 64-bit FNV-1a hash — engine-pinned (no dependence on
  * JVM `hashCode` or Spark's seedable hashes) so signatures are stable across
  * Spark versions, partitionings, and rounds. */
object Fnv1a64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= Prime
      i += 1
    }
    h
  }

  def hashString(s: String): Long = hashBytes(s.getBytes("UTF-8"))
}

/** 64-bit SimHash over a token array (near-duplicate fingerprint, one of the
  * dedup family required beyond the reference surface). Per token: FNV-1a
  * 64-bit hash; each bit votes +1/-1; sign of the vote vector is the
  * fingerprint. Hamming distance between fingerprints approximates cosine
  * distance between token multisets. */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Fnv1a64.hashBytes(arr.getUTF8String(t).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprint (SURVEY "document fingerprinting"): rolling
  * FNV-1a over character k-grams (k=8), then the minimum hash in each window
  * of w=16 grams, deduplicated — a compact `array<long>` signature whose
  * overlap estimates copy/near-copy regions between documents. */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowFp", this, classOf[WinnowFingerprint].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(s8: UTF8String): ArrayData = {
    val sig = WinnowFingerprint.fingerprint(s8.toString, k, w)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sig.map(java.lang.Long.valueOf).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprint {
  /** Distinct window-minimum hashes of character k-grams, ascending order
    * (order-normalized so set overlap is a plain array_intersect). */
  def fingerprint(s: String, k: Int, w: Int): Seq[Long] = {
    if (s.length < k) return Seq.empty
    val nGrams = s.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = Fnv1a64.hashString(s.substring(i, i + k))
      i += 1
    }
    if (nGrams <= w) {
      // Unsigned min, matching the windowed path below — signed `min` would
      // pick a different gram whenever some hash has the top bit set, breaking
      // the short-doc vs containing-doc overlap property.
      var mn = hashes(0)
      var i2 = 1
      while (i2 < nGrams) {
        if (java.lang.Long.compareUnsigned(hashes(i2), mn) < 0) mn = hashes(i2)
        i2 += 1
      }
      return Seq(mn)
    }
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    var start = 0
    while (start + w <= nGrams) {
      var mn = hashes(start)
      var j = start + 1
      while (j < start + w) {
        if (java.lang.Long.compareUnsigned(hashes(j), mn) < 0) mn = hashes(j)
        j += 1
      }
      picked += mn
      start += 1
    }
    picked.toSeq
  }
}
