package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that predicate pushdown cannot move.
  *
  * `PushDownPredicates` substitutes projection aliases into any
  * deterministic filter condition it pushes below a `Project` — for
  * the annotate entry streams that re-inlined the STAGED term trees
  * (split off precisely to be bound once) into the union filters,
  * ~1.8K expression nodes of pure plan mass per call (round-11
  * PERF.md; round-11 verdict #2). Wrapping the filter condition in
  * this expression marks it non-deterministic FOR THE OPTIMIZER ONLY
  * (evaluation is the child's, bit for bit, interpreted and codegen),
  * so the filter stays put, evaluated once against the staged
  * columns right above the projection that defines them.
  *
  * Use ONLY on filters whose placement is already where it belongs —
  * the wrapper also hides the predicate from scan pushdown and
  * constraint propagation. */
case class NoPushdown(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoPushdown =
    copy(child = newChild)
}

object PlanBarrier {
  /** `cond`, pinned in place (see [[NoPushdown]]). NOTE: Spark pushes
    * even nondeterministic predicates through row-preserving Projects
    * (SPARK-10316), so wrapping a FILTER condition alone does not stop
    * alias inlining — wrap the projection FIELD the filter reads
    * (a nondeterministic field fails `fields.forall(_.deterministic)`
    * and blocks the push), or use [[pinnedWhere]]. */
  def noPushdown(cond: Column): Column =
    GraftColumnBridge.column(NoPushdown(GraftColumnBridge.expression(cond)))

  /** `df.where(cond)` that predicate pushdown cannot move below this
    * point: the condition is staged as a nondeterministic projection
    * field the filter then reads. Use where pushing the predicate
    * below would only INLINE derived-column trees into a scan filter
    * it cannot prune with anyway (e.g. `length(ref) = 1` over a
    * projected table — no row-group statistic evaluates that). */
  def pinnedWhere(df: org.apache.spark.sql.DataFrame,
      cond: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col("*"), noPushdown(cond).as("_graft_pin"))
      .where(col("_graft_pin")).drop("_graft_pin")
  }
}
