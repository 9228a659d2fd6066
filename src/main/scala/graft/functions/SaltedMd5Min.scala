package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `array_min(transform(shingles, s -> md5(salt || s)))` over word
  * `shingleSize`-shingles of a TOKEN array, as one tight-loop expression —
  * exact value parity with the composed form (so the md5-based MinHash
  * oracle queries keep their DuckDB-shared semantics), minus the
  * interpreted lambdas, the shingle-string materialization, and the
  * per-element hex/UTF8String churn:
  *
  *  - shingle bytes are fed to the digest incrementally
  *    (salt, tok_i, ' ', tok_i+1, ' ', …) — byte-identical to hashing the
  *    joined string, with zero shingle allocation;
  *  - digests are compared as unsigned bytes (hex encoding is monotonic in
  *    byte order, so byte-min ≡ hex-string-min) and only the winning
  *    digest is hex-encoded;
  *  - one thread-local MessageDigest.
  *
  * Returns null for docs with fewer than `shingleSize` tokens (the
  * composed form's empty-shingles → null-min).
  */
case class SaltedMd5Min(child: Expression, salt: String, shingleSize: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "salted_md5_min"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  @transient private lazy val saltBytes = salt.getBytes("UTF-8")

  @transient private lazy val space = " ".getBytes("UTF-8")

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Whole-stage codegen: one virtual call into this tight loop, keeping
    * the surrounding stage compiled (CodegenFallback would collapse the
    * whole projection to interpreted mode). */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("saltedMd5Min", this, classOf[SaltedMd5Min].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = $ref.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)
  }

  def compute(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n < shingleSize) return null
    val tokenBytes = Array.tabulate(n)(i =>
      if (arr.isNullAt(i)) Array.emptyByteArray else arr.getUTF8String(i).getBytes)
    val md = SaltedMd5Min.digests.get()
    var best: Array[Byte] = null
    var i = 0
    while (i + shingleSize <= n) {
      md.reset()
      md.update(saltBytes)
      var j = 0
      while (j < shingleSize) {
        if (j > 0) md.update(space)
        md.update(tokenBytes(i + j))
        j += 1
      }
      val d = md.digest()
      if (best == null || SaltedMd5Min.unsignedLess(d, best)) best = d
      i += 1
    }
    if (best == null) null
    else UTF8String.fromString(SaltedMd5Min.hex(best))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SaltedMd5Min {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private[functions] def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  private[functions] def hex(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }
}
