package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Quantile bucket id of a numeric value against precomputed boundaries
  * (ascending). Bucket b means boundaries(b-1) < v ≤ boundaries(b), so ids
  * range over [0, boundaries.length]. Equal-frequency buckets make the
  * downstream Z-order skew-resistant where width_bucket's equal-width
  * buckets would collapse under a hot range. Null → bucket 0 (sorts first,
  * like NULLS FIRST).
  */
case class QuantileBucket(child: Expression, boundaries: Seq[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty && boundaries == boundaries.sorted,
    "boundaries must be non-empty ascending")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    // primitive numerics only: the codegen path casts the raw value to
    // double, which DecimalType's object representation would break
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a primitive numeric input")
  }

  @transient private lazy val bounds: Array[Double] = boundaries.toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Integer.valueOf(0)
    else Integer.valueOf(compute(v.asInstanceOf[Number].doubleValue()))
  }

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantileBucket", this, classOf[QuantileBucket].getName)
    val childGen = child.genCode(ctx)
    ev.copy(
      code = childGen.code.asInstanceOf[org.apache.spark.sql.catalyst.expressions.codegen.Block] +
        org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
          Seq(s"""
            |int ${ev.value} = ${childGen.isNull} ? 0 :
            |  $ref.compute((double) ${childGen.value});
            |""".stripMargin), Nil),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  def compute(v: Double): Int = {
    var lo = 0
    var hi = bounds.length // bucket ids 0..bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v <= bounds(mid)) hi = mid else lo = mid + 1
    }
    lo
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Morton (Z-order) interleave of 2..8 bucket ids, `bits` bits each
  * (bits × arity ≤ 63). Rows sorted by the z-value cluster along ALL the
  * interleaved dimensions at once, so per-file min/max stats prune multi-
  * predicate scans — the data-skipping layout lakehouse tables use.
  */
case class ZInterleave(children: Seq[Expression], bits: Int)
    extends Expression {

  require(children.size >= 2 && children.size <= 8, "2..8 dimensions")
  require(bits >= 1 && bits * children.size <= 63, "bits × dims must fit in a long")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == IntegerType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("zinterleave requires integer bucket inputs")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = new Array[Int](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      vals(i) = if (v == null) 0 else v.asInstanceOf[Int]
      i += 1
    }
    java.lang.Long.valueOf(ZInterleave.interleave(vals, bits))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val arr = ctx.freshName("zvals")
    val assigns = gens.zipWithIndex.map { case (g, i) =>
      s"$arr[$i] = ${g.isNull} ? 0 : (int) ${g.value};"
    }.mkString("\n")
    val childCode = gens.map(_.code.toString).mkString("\n")
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.CodeBlock(
        Seq(s"""
          |$childCode
          |int[] $arr = new int[${children.size}];
          |$assigns
          |long ${ev.value} = graft.functions.ZInterleave.interleave($arr, $bits);
          |""".stripMargin), Nil),
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZInterleave {
  /** Bit-interleave: output bit (b·dims + d) = bit b of vals(d). */
  def interleave(vals: Array[Int], bits: Int): Long = {
    var out = 0L
    var b = 0
    while (b < bits) {
      var d = 0
      while (d < vals.length) {
        if (((vals(d) >>> b) & 1) == 1)
          out |= 1L << (b * vals.length + d)
        d += 1
      }
      b += 1
    }
    out
  }
}
