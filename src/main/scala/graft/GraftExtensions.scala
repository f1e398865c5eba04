package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayDotLong, Md5Lower64}

/** Session extensions: expose graft's native Catalyst expressions to
  * SQL (`SELECT md5lower64(text), array_dot_long(a, b) …`) so the
  * catalog-SQL surface and the DataFrame surface are the same engine.
  *
  * Registered via `SparkSession.builder.withExtensions` in
  * [[GraftSession]]; also usable with
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("md5lower64"),
      new ExpressionInfo(classOf[Md5Lower64].getName, "md5lower64"),
      (children: Seq[Expression]) => Md5Lower64(children.head)))
    ext.injectFunction((
      new FunctionIdentifier("array_dot_long"),
      new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
      (children: Seq[Expression]) => ArrayDotLong(children(0), children(1))))
  }
}
