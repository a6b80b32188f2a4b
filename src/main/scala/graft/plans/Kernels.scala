package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the engine's hot kernels — the top tier
 * of the extension ladder (SURVEY §7.3), one rung above the Scala UDFs in
 * [[graft.functions.Fast]]: same bit-identical arithmetic (the DuckDB
 * oracles and `FastEquivalenceSpec` pin it), but the generated Java calls
 * the static kernel directly on Tungsten values (`UTF8String`,
 * `ArrayData`) — no encoder/boxing boundary, null handling folded into the
 * stage, and the surrounding projection stays inside whole-stage codegen.
 *
 * All are registered as SQL functions by [[graft.GraftExtensions]].
 */
/** `graft_shingle_hashes(text)` — distinct 3-gram shingle hashes. */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_hashes expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.shingleHashesUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.shingleHashesUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `graft_winnow(text)` — winnowing fingerprint set (sorted distinct
  * window minima of the positional 3-gram hashes, w = 4). */
case class WinnowFps(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.winnowUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.winnowUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFps =
    copy(child = newChild)
}

/** `graft_minhash(shingles)` — MinHash signature of a shingle-hash array. */
case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects ARRAY<BIGINT>, got ${t.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.minhashArr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.minhashArr($c)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
}

/** `graft_simhash16(text)` — 16-bit SimHash over token hashes. */
case class Simhash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash16"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash16 expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.simhash16Utf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.simhash16Utf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

/** `graft_simhash62(text)` — 62-bit SimHash (token polyhash + its
  * multiplicative mix for the high bits); the collision-robust width
  * for corpus-scale near-dup fingerprinting ([[graft.functions.Fast.simhash62Jvm]]). */
case class Simhash62(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash62"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash62 expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.simhash62Utf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.simhash62Utf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash62 =
    copy(child = newChild)
}

/** `graft_intersect_size(a, b)` — |a ∩ b| of two BIGINT arrays without
  * null elements: exactly `size(array_intersect(a, b))` (DISTINCT
  * intersection — duplicates count once), computed by a primitive
  * open-addressing probe with no boxing and no output array
  * ([[graft.functions.Fast.intersectSizeJvm]]). The dedup verify joins'
  * per-candidate kernel. */
case class IntersectSize(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_size"
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find {
      case ArrayType(LongType, _) => false
      case _                      => true
    } match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_size expects ARRAY<BIGINT>, got ${t.catalogString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  // schema-dispatched null handling: arrays whose TYPE admits null
  // elements (e.g. any array re-read from parquet, where element
  // nullability is not recorded) route through the null-aware variant —
  // exactly size(array_intersect), null counted once when both sides
  // hold one. Null-free types keep the bulk-copy fast path at zero cost.
  // Without this the fast path would NPE (GenericArrayData) or silently
  // read nulls as 0 (UnsafeArrayData) — the r16 ADVICE finding.
  private lazy val mayHoldNullElements: Boolean =
    Seq(left, right).exists(_.dataType match {
      case ArrayType(_, cn) => cn
      case _                => false
    })
  private lazy val kernelName =
    if (mayHoldNullElements) "intersectSizeNullAware" else "intersectSizeArr"
  override def nullSafeEval(a: Any, b: Any): Any =
    if (mayHoldNullElements)
      graft.functions.Fast.intersectSizeNullAware(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      graft.functions.Fast.intersectSizeArr(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Fast.$kernelName($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)
}

/** `graft_pinned(e)` — IDENTITY wrapper flagged non-deterministic to PIN
  * the evaluation site of an expensive (but pure) kernel: the optimizer
  * may not duplicate, push down, or constant-fold through it (the guide
  * §4.4 "mark the expensive UDF non-deterministic" pattern, as a native
  * expression). The dedup verify joins use it so the intersect kernel is
  * computed ONCE per candidate in a projection ABOVE the join — without
  * it the threshold filter referencing the kernel column is inlined and
  * pushed into the join condition, and the surviving pairs' jaccard
  * projection evaluates the kernel a second time. Semantically identity:
  * the child is pure; only the optimizer's freedom is restricted. */
case class Pinned(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def prettyName: String = "graft_pinned"
  override def nullSafeEval(input: Any): Any = input
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(newChild: Expression): Pinned =
    copy(child = newChild)
}

private object FloatArrayCheck {
  def apply(name: String, t: DataType): TypeCheckResult = t match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects ARRAY<FLOAT>, got ${other.catalogString}")
  }
}

/** `graft_dot(a, b)` — left-fold dot product, float→double per element. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(c => FloatArrayCheck(prettyName, c.dataType))
      .find(!_.isSuccess).getOrElse(TypeCheckResult.TypeCheckSuccess)
  override def nullSafeEval(a: Any, b: Any): Any =
    graft.functions.Fast.dotArr(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Fast.dotArr($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `graft_norm(v)` — L2 norm (sqrt of the left-fold self-dot). */
case class NormL2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.normArr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.normArr($c)")
  override protected def withNewChildInternal(newChild: Expression): NormL2 =
    copy(child = newChild)
}

/** `graft_lsh_buckets(v)` — all hyperplane-LSH table bucket ids. */
/** `graft_cdc_chunks(text)` — content-defined chunk strings (rolling-hash
  * boundaries; see [[graft.dedup.Cdc]]). */
case class CdcChunks(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_cdc_chunks"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects STRING, got ${child.dataType.catalogString}")
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.cdcChunksUtf8(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.cdcChunksUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

case class LshBuckets(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"
  override def checkInputDataTypes(): TypeCheckResult =
    FloatArrayCheck(prettyName, child.dataType)
  override def nullSafeEval(input: Any): Any =
    graft.functions.Fast.bucketsArr(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fast.bucketsArr($c)")
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}
