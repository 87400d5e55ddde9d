package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `SparkSessionExtensions` entry point — the idiomatic, zero-code-change
 * way to give ANY Spark deployment (spark-submit jobs, Thrift server,
 * notebooks) the engine's SQL functions at session build:
 *
 *   spark.sql.extensions=graft.GraftExtensions
 *
 * Unlike `Registry.registerAll` (temp functions on an existing session),
 * injected functions are part of the session's base registry from the
 * first statement, survive `newSession()`, and need no driver-side call.
 * `GraftSession.builder` sets the config by default so every entry point
 * of this library gets both paths.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.Registry.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
