package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/**
 * Native AS-OF JOIN — the whole-operator tier of the extension ladder
 * (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered via
 * `SparkSessionExtensions`): for every left row, the single latest right
 * row of the same key with time before (strict) or at-or-before the left
 * row's time.
 *
 * Why a custom operator: composed forms either build the M×N band join
 * and aggregate it away, or window over a UNION of both sides — each
 * materializes strictly more than the answer. The physical operator
 * declares `ClusteredDistribution` on the keys for BOTH children and a
 * per-partition (key, time) sort — Catalyst's EnsureRequirements then
 * plans exactly one co-partitioning shuffle per side (same machinery as
 * SortMergeJoin, AQE-compatible) — and the merge itself is one streaming
 * O(|L|+|R|) pass per partition holding ONE buffered right row: no pair
 * blowup, no union rewrite, bounded memory at any scale.
 *
 * Semantics reference: the composed `join_asof` gate query (window-over-
 * prior-rows form), which this operator must match row-for-row — the
 * equivalence is oracled (`join_asof_native` shares join_asof's DuckDB
 * oracle) and spec-pinned.
 */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        strict: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]] (injected by
  * [[graft.GraftExtensions]] via `injectPlannerStrategy`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime, j.strict,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression, strict: Boolean,
                        left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one co-partitioning shuffle per side, chosen by EnsureRequirements —
  // the SortMergeJoin contract
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition (key, time) sort feeds the streaming merge
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val isStrict = strict
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      // one-row lookahead over the sorted right side (rows copied out of
      // the scanner's reused buffer; ONE live right row + one lookahead)
      var nextRight: InternalRow = null
      var nextKey: InternalRow = null
      var nextTime = 0L
      def advance(): Unit =
        if (rIter.hasNext) {
          nextRight = rIter.next().copy()
          nextKey = rKeyProj(nextRight).copy()
          nextTime = rTimeProj(nextRight).getLong(0)
        } else nextRight = null
      advance()

      var curRight: InternalRow = null
      var curKey: InternalRow = null
      var curTime = 0L
      @inline def timeOk(rt: Long, lt: Long): Boolean =
        if (isStrict) rt < lt else rt <= lt

      lIter.map { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l).getLong(0)
        var scanning = true
        while (scanning && nextRight != null) {
          val c = keyOrd.compare(nextKey, lKey)
          if (c < 0 || (c == 0 && timeOk(nextTime, lTime))) {
            curRight = nextRight; curKey = nextKey; curTime = nextTime
            advance()
          } else scanning = false
        }
        val matched = curRight != null &&
          keyOrd.compare(curKey, lKey) == 0 && timeOk(curTime, lTime)
        resultProj(joined(l, if (matched) curRight else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Programmatic entry point (column names resolve against each side's
  * analyzed output; alias the right side's columns so names and
  * attribute ids stay distinct across the two inputs). */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
           leftKeyCols: Seq[String], rightKeyCols: Seq[String],
           leftTimeCol: String, rightTimeCol: String,
           strict: Boolean = true): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lp, leftTimeCol)
    val rt = attr(rp, rightTimeCol)
    require(lt.dataType == LongType && rt.dataType == LongType,
      s"as-of time columns must be LONG, got ${lt.dataType}/${rt.dataType}")
    org.apache.spark.sql.graft.Bridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lp, rp, leftKeyCols.map(attr(lp, _)), rightKeyCols.map(attr(rp, _)),
        lt, rt, strict))
  }
}
