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
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its
    // internal runtime join filters but does not register them as SQL
    // functions — expose them for the C19b bloom decontamination
    // screen (graft_bloom_agg(xxhash64(x), items, bits) → binary;
    // graft_bloom_contains(bf, xxhash64(x)) → boolean).
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(c)        => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n)     => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b)  => new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(c, n, b)
        case _ => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
          messageParameters = Map(
            "functionName" -> "graft_bloom_agg", "expectedNum" -> "1 to 3",
            "actualNum" -> children.length.toString,
            "docroot" -> "https://spark.apache.org/docs/latest"))
      }))
    // SQL surface for the C22 scrub: expands to the same ordered chain
    // of builtin (codegen'd) RegExpReplace nodes as
    // TextFunctions.redactPii, so `SELECT graft_redact_pii(text)` and
    // the DataFrame form plan identically.
    ext.injectFunction((
      new FunctionIdentifier("graft_redact_pii"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
        "graft_redact_pii"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_redact_pii", "expectedNum" -> "1",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        graft.functions.TextFunctions.piiPatterns.foldLeft(children(0)) {
          case (e, (pat, repl)) =>
            org.apache.spark.sql.catalyst.expressions.RegExpReplace(e,
              org.apache.spark.sql.catalyst.expressions.Literal(pat),
              org.apache.spark.sql.catalyst.expressions.Literal(repl))
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_contains"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_bloom_contains"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "graft_bloom_contains", "expectedNum" -> "2",
              "actualNum" -> children.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children(0), children(1))
      }))
  }
}
