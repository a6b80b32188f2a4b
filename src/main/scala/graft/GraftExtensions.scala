package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.PolyHash

/**
 * Engine extensions, registered with
 * `.config("spark.sql.extensions", "graft.GraftExtensions")`:
 *
 *  - `graft_polyhash(text)`: codegen'd polynomial document hash
 *    ([[graft.plans.PolyHash]]) usable from SQL text and `call_function`.
 *
 * The extension-point route (SparkSessionExtensions) keeps custom pieces
 * out of the query-building API: any SQL client of the session gets the
 * function, and Catalyst treats it like a built-in (null folding,
 * whole-stage codegen, constant folding over literals).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "graft_polyhash"),
      (children: Seq[Expression]) => PolyHash(children.head)
    ))
  }
}
