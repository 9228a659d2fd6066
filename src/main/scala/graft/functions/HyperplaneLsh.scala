package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-bit random-hyperplane LSH bucket of a vector column: bit p =
  * sign(v · plane_p), planes drawn deterministically from FNV-1a64 of
  * (seed, p, dim-index) — reproducible across executors, sessions, rounds.
  *
  * Exists as a single expression (not a 512-node column-arithmetic tree —
  * that shape dominated q34's runtime 4× over the whole rest of the query):
  * the plane matrix is materialized once per executor in a transient field
  * and the per-row cost is one tight nPlanes×dim loop. */
case class HyperplaneLsh(child: Expression, dim: Int, nPlanes: Int, seed: Long)
    extends UnaryExpression {

  require(nPlanes > 0 && nPlanes <= 63, "nPlanes must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float|double>")
  }

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes)(p => Array.tabulate(dim)(d =>
      Fnv1a64.hashString(s"$seed|$p|$d").toDouble / Long.MaxValue))

  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(compute(input.asInstanceOf[ArrayData]))

  /** Keeps the stage whole-stage-compiled — see SaltedMd5Min.doGenCode. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneLsh", this, classOf[HyperplaneLsh].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  def compute(arr: ArrayData): Long = {
    val n = math.min(dim, arr.numElements())
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      val plane = planes(p)
      var dot = 0.0
      var d = 0
      while (d < n) {
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        dot += x * plane(d)
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
