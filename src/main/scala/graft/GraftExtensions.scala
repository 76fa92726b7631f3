package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension point for cluster deployments (the reference's
  * module/plugin loading, flink-table Module + FunctionCatalog):
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  * }}}
  *
  * registers the engine's native expressions (`vec_dot`,
  * [[graft.functions.DotProduct]]; `vec_nearest`,
  * [[graft.functions.NearestCentroids]]; `pq_adc`,
  * [[graft.functions.PqAdc]]) in every session of the application.
  * Locally the same registration happens lazily per session at the
  * [[Tables.load]] bootstrap chokepoint, so embedded use needs no
  * configuration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(graft.functions.VectorExpressions.dotDescription)
    ext.injectFunction(graft.functions.VectorExpressions.nearestDescription)
    ext.injectFunction(graft.functions.VectorExpressions.pqAdcDescription)
  }
}
