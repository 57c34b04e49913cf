package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity

/** Catalyst extensions for the graft engine: registers the native
  * codegen'd functions so they are usable from SQL and
  * `functions.call_function`. Installed by GraftSession (or any
  * session built with `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_cosine",
              "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        CosineSimilarity(children(0), children(1))
      }))
  }
}
