package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** SQL registration for the custom Catalyst expressions (the guide's
  * `createOrReplaceTempFunction` route — Column construction from raw
  * expressions is version-sensitive in Spark 4, SQL registration is
  * stable). Call `GraftFunctions.register(spark)` once per session, then
  * use `expr("graft_dot_product(a, b)")` / `graft_minhash(col)` in any
  * DataFrame or SQL program.
  */
object GraftFunctions {
  private val registered = ConcurrentHashMap.newKeySet[String]()

  def register(spark: SparkSession): Unit = {
    if (registered.add(String.valueOf(System.identityHashCode(spark)))) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_dot_product",
        exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_minhash",
        exprs => MinHashAgg(exprs.head, k = 16), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_simhash",
        exprs => SimHashAgg(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_lsh_bucket",
        exprs => LshBucket(exprs.head), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_md5_prefix",
        exprs => Md5Prefix(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue), "built-in")
    }
  }
}
