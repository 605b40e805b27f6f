package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotProduct, LshBucket, MinHashAgg, SimHashAgg}

/** SparkSessionExtensions entry point: makes the custom expressions
  * available to ANY session started with
  * `--conf spark.sql.extensions=graft.GraftExtensions` (cluster-wide
  * deployment path) — equivalent to the per-session
  * `GraftFunctions.register`, but wired through the extensions API so
  * SQL-only users (spark-sql, thrift-server, notebooks) get the
  * functions with no Scala call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo(classOf[GraftExtensions].getName, name, usage,
        "", "")
    ext.injectFunction((FunctionIdentifier("graft_dot_product"),
      info("graft_dot_product",
        "graft_dot_product(a, b) - codegen'd float/double array dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(col) - 16-seed one-pass MinHash signature"),
      (exprs: Seq[Expression]) => MinHashAgg(exprs.head, k = 16)))
    ext.injectFunction((FunctionIdentifier("graft_simhash"),
      info("graft_simhash",
        "graft_simhash(col) - 64-bit one-pass SimHash signature"),
      (exprs: Seq[Expression]) => SimHashAgg(exprs.head)))
    ext.injectFunction((FunctionIdentifier("graft_lsh_bucket"),
      info("graft_lsh_bucket",
        "graft_lsh_bucket(vec) - 8 hyperplane sign bits"),
      (exprs: Seq[Expression]) => LshBucket(exprs.head)))
    // whole-operator extension: the native as-of join plan node
    // (graft.plans.AsOfJoin) — builder guidance option (c)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
