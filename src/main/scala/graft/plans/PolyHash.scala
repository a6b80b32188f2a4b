package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the engine's polynomial document hash
 * (`graft_polyhash(text)` = [[graft.functions.TextFunctions.fingerprint]]
 * = [[graft.functions.Fast.fingerprintFast]], bit-identical).
 *
 * This is the top tier of the extension ladder (SURVEY §7.3): unlike the
 * Scala UDF it participates in whole-stage codegen — the generated Java
 * calls the static kernel directly on the `UTF8String`, no
 * encoder/boxing boundary, null handling folded into the stage. Registered
 * as a SQL function by [[graft.GraftExtensions]] via
 * `SparkSessionExtensions.injectFunction`.
 */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.polyHashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.polyHashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}
