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

    ext.injectFunction((FunctionIdentifier("cosine_similarity"), info("cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("extract_json_objects"), info("extract_json_objects"),
      (es: Seq[Expression]) => ExtractJsonObjects(es.head)))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => SimHash64(es.head)))
    ext.injectFunction((FunctionIdentifier("winnow_fingerprint"), info("winnow_fingerprint"),
      (es: Seq[Expression]) => WinnowFingerprint(es.head, 8, 16)))
    ext.injectFunction((FunctionIdentifier("minhash_signature"), info("minhash_signature"),
      (es: Seq[Expression]) => MinHashSignature(es.head, 8, 3)))
  }
}
