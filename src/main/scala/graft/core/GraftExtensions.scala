package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.FloatDotProduct

/** Engine extensions, injected via `spark.sql.extensions` (set by
  * [[Session.tuned]]) — the SparkSessionExtensions registration path the
  * build brief's tier (c) describes. Currently: the `vec_dot` native
  * similarity kernel.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatDotProduct].getCanonicalName, "vec_dot"),
      (children: Seq[Expression]) => FloatDotProduct(children(0), children(1))))
  }
}
