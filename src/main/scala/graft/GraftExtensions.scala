package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineMilli, DotDouble, RollingMinHash}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions into the session's function registry, so they are usable
  * from SQL text and expr() exactly like built-ins
  * (`spark.sql.extensions=graft.GraftExtensions`, set in [[Sessions]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_milli"),
      new ExpressionInfo(classOf[CosineMilli].getName, "cosine_milli"),
      (children: Seq[Expression]) => CosineMilli(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_double"),
      new ExpressionInfo(classOf[DotDouble].getName, "dot_double"),
      (children: Seq[Expression]) => DotDouble(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (children: Seq[Expression]) => RollingMinHash(
        children.head,
        children(1).eval().asInstanceOf[Int])))
  }
}
