package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Logical AS-OF join: for each left row, the single right row with equal
  * join keys and the greatest right time `<=` (or `<`) the left time.
  *
  * This is the whole-operator rung of the custom-operator ladder
  * (SURVEY §7.3): the semantics — "top-1 per left row under an
  * inequality" — are expressible with built-ins only as window-over-union
  * (one table, see q38) or join+rank (quadratic in the time-range hit
  * count), neither of which is a two-table operator a user can call. The
  * node is constructed already-resolved by [[GraftOps.asofJoin]] and
  * planned by [[AsOfJoinStrategy]] into [[AsOfJoinExec]].
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    allowEqual: Boolean,
    leftOuter: Boolean,
    tolerance: Option[Long])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (if (leftOuter) right.output.map(_.withNullability(true))
                    else right.output)

  override lazy val resolved: Boolean =
    childrenResolved &&
      (leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(_.resolved)

  override def maxRows: Option[Long] =
    if (leftOuter) left.maxRows
    else left.maxRows // inner as-of emits at most one row per left row

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoinPlan]] — registered session-wide via
  * `spark.sql.extensions=graft.GraftSparkExtensions` or per-session by
  * [[GraftOps.ensure]] (through `spark.experimental.extraStrategies`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.allowEqual, j.leftOuter, j.tolerance,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Public Dataset-level API for the engine's custom whole-plan operators. */
object GraftOps {

  /** Idempotent per-session registration of the planner strategy (the
    * programmatic alternative to `spark.sql.extensions`). */
  def ensure(s: SparkSession): Unit = {
    val es = s.experimental
    if (!es.extraStrategies.contains(AsOfJoinStrategy))
      es.extraStrategies = es.extraStrategies :+ AsOfJoinStrategy
  }

  /** AS-OF join `left` with `right`: equal `leftOn`/`rightOn` keys and the
    * greatest `rightTimeCol` value `<=` `leftTimeCol` (`<` when
    * `allowEqual=false`). Output columns are `left.*` then `right.*`;
    * give the two sides disjoint column names. `leftOuter=true` keeps
    * unmatched left rows with nulls on the right.
    *
    * Right-side ties on `(keys, time)` resolve to the last row in sort
    * order — pre-deduplicate the right side where that matters.
    *
    * `tolerance` (pandas `merge_asof` semantics) bounds match staleness
    * in the time column's internal units (e.g. microseconds for
    * timestamps): if the latest match is older than `tolerance`, the left
    * row is unmatched — no fallback to an even older row. Integral and
    * timestamp time columns only.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String,
      allowEqual: Boolean = true,
      leftOuter: Boolean = false,
      tolerance: Option[Long] = None): DataFrame = {
    require(leftOn.length == rightOn.length && leftOn.nonEmpty,
      "as-of join needs at least one equi key per side")
    val spark = left.sparkSession
    ensure(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // self-join safety: if the two sides share attribute ids (both built
    // from the same scan), re-alias the right side with fresh ids — the
    // generic analyzer dedup only knows built-in binary nodes
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    val resolver = spark.sessionState.conf.resolver
    def resolve(plan: LogicalPlan, name: String, side: String): Attribute =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"as-of join: no column `$name` on the $side side " +
            s"(has: ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"as-of join: `$name` is ambiguous on the $side side " +
            s"(${many.size} matches)")
      }

    val lTime = resolve(lPlan, leftTimeCol, "left")
    val rTime = resolve(rPlan, rightTimeCol, "right")
    // the merge iterator compares right times through an ordering built
    // from the LEFT time's type — a mismatch (int vs bigint) would
    // miscompare or ClassCastException at runtime, so fail at plan time
    require(lTime.dataType == rTime.dataType,
      s"as-of join: time column types differ — left `$leftTimeCol` is " +
        s"${lTime.dataType.simpleString}, right `$rightTimeCol` is " +
        s"${rTime.dataType.simpleString}; cast one side explicitly")
    if (tolerance.isDefined) {
      import org.apache.spark.sql.types._
      val ok = lTime.dataType match {
        case ByteType | ShortType | IntegerType | LongType |
             TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
      require(ok,
        s"as-of join: tolerance needs an integral/timestamp/date time " +
          s"column, got ${lTime.dataType.simpleString}")
    }
    val node = AsOfJoinPlan(
      lPlan, rPlan,
      leftOn.map(resolve(lPlan, _, "left")),
      rightOn.map(resolve(rPlan, _, "right")),
      lTime, rTime,
      allowEqual, leftOuter, tolerance)
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark, node)
  }
}
