package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions into the session's FunctionRegistry so the full surface is
  * reachable from plain SQL —
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` — including through
  * `--conf spark.sql.extensions=graft.GraftExtensions` on an unmodified
  * Spark deployment.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name)

    // theta band-join → banded equi-join rewrite (see graft.plans)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)

    // one shared (name, builder) list drives BOTH SQL registration paths —
    // graft.functions.registerAll and this extension expose identical surfaces
    graft.functions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
  }
}
