package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Deployment-dependent execution limits (SURVEY §2.2 op 15 /
  * reference consts.py:29 + utils/custom_config.py:9-16: LOCAL caps at
  * 100 rows, BRANCH at 1,000, PROD unlimited — dev runs stay cheap while
  * the production plan is identical).
  *
  * The reference's `slice(0, N)` is file-order-dependent; Spark's `limit`
  * is not order-stable, so the engine's contract requires an explicit
  * ordering when limits feed anything order-sensitive (tests, oracles).
  */
object EngineConf {

  sealed trait Deployment { def rowLimit: Option[Int] }
  case object Local extends Deployment { val rowLimit = Some(100) }
  case object Branch extends Deployment { val rowLimit = Some(1000) }
  case object Prod extends Deployment { val rowLimit = None }

  def fromEnv(env: Map[String, String] = sys.env): Deployment =
    env.getOrElse("GRAFT_DEPLOYMENT", "PROD").toUpperCase match {
      case "LOCAL" => Local
      case "BRANCH" => Branch
      case _ => Prod
    }

  /** Apply the deployment row limit after a deterministic ordering. */
  def applyLimit(df: DataFrame, deployment: Deployment, orderBy: Seq[Column]): DataFrame =
    deployment.rowLimit match {
      case Some(n) if orderBy.nonEmpty => df.orderBy(orderBy: _*).limit(n)
      case Some(n) => df.limit(n)
      case None => df
    }
}
