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
        exprs => {
          // validate here: a bare exprs(1).eval() turns a missing or
          // non-literal digits arg into IndexOutOfBounds/NPE instead
          // of a usable resolution error
          if (exprs.length != 2) throw new IllegalArgumentException(
            s"graft_md5_prefix(str, digits) takes 2 arguments, " +
              s"got ${exprs.length}")
          // foldable (not just bare-literal): `1+14` or CAST(15 AS INT)
          // resolve here the same way the old eval()-path accepted them
          val digits = exprs(1) match {
            case f if f.foldable => f.eval() match {
              case n: Number => n.intValue
              case other => throw new IllegalArgumentException(
                "graft_md5_prefix digits must be an integer literal, " +
                  s"got $other")
            }
            case other => throw new IllegalArgumentException(
              "graft_md5_prefix digits must be an integer literal, " +
                s"got ${other.sql}")
          }
          Md5Prefix(exprs.head, digits)
        }, "built-in")
    }
  }
}
