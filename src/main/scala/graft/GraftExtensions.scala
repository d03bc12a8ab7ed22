package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point for cluster deployments:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes every native
  * graft expression SQL-callable in all sessions of the application
  * (the build-time twin of [[graft.functions.GraftFunctions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    // plan rewrites: naive |a−b| ≤ δ joins become bucketed band joins
    // (see graft.plans.BandJoinRewrite for the fire conditions)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}
