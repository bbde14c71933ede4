package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Deployment-shaped registration of the library's native expressions —
  * the `SparkSessionExtensions` tier of the custom-operator ladder
  * (guide preference (c) machinery, used here for function injection):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  * }}}
  *
  * makes `vector_dot` available in EVERY session of the application —
  * pure-SQL users included — without any per-session
  * [[VectorDot.register]] call. Builder-composed sessions can
  * equivalently use `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vector_dot"), VectorDot.info, VectorDot.builder))
    ext.injectFunction((FunctionIdentifier("kmv_distinct"), KmvDistinct.info, KmvDistinct.builder))
    // rewrite interpreted self-HOF dots (norms) into the codegen'd kernel
    ext.injectOptimizerRule(_ => graft.plans.RewriteSelfHofDot)
  }
}
