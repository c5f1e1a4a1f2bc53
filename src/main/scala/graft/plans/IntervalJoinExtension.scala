package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, FilterExec, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.index.ContigIntervalIndex

/** Transparent interval-join rewrite (SURVEY.md §2 J1-J3/J5, §3.1):
  * an ordinary SQL join whose condition is
  *
  *   a.contig = b.contig AND a.start <= b.end AND a.end >= b.start
  *
  * (any conjunct order/side order; `<`/`>` accepted and normalized by
  * ±1 — the reference's `minus_one()` rewrite,
  * physical_planner/intervals.rs:63-124) is planned as a broadcast
  * per-contig-index join instead of a hash join with a post-filter
  * (which degenerates to a per-contig cross product). A range-only
  * condition with no equi-key is also accepted — all intervals land in
  * one index bucket (the reference's NestedLoopJoin fallback,
  * bio_physical_planner.rs:125-146).
  *
  * Unlike the reference (which REMOVES DataFusion's join_selection
  * rule, session_context.rs:29-31), this is a plain extra Strategy:
  * when it declines (non-Inner join, shape mismatch, oversized build
  * side) Spark's stock planning proceeds untouched.
  */
object IntervalJoinStrategy extends SparkStrategy with PredicateHelper {

  /** Size cap for the CollectLeft build side (bytes of plan stats). */
  private val maxBuildBytes = 1L << 30

  private case class Extracted(
      contigs: Option[(Expression, Expression)], // (left, right)
      lStart: Expression, rEnd: Expression, strictLe: Boolean,
      lEnd: Expression, rStart: Expression, strictGe: Boolean,
      residual: Seq[Expression])

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | ShortType => true
    case _ => false
  }

  private def extract(j: Join): Option[Extracted] = {
    val lOut = j.left.outputSet
    val rOut = j.right.outputSet
    def leftOnly(e: Expression) = e.references.nonEmpty && e.references.subsetOf(lOut)
    def rightOnly(e: Expression) = e.references.nonEmpty && e.references.subsetOf(rOut)

    val conjuncts = j.condition.map(splitConjunctivePredicates).getOrElse(return None)
    var contig: Option[(Expression, Expression)] = None
    var le: Option[(Expression, Expression, Boolean)] = None // lStart <= rEnd
    var ge: Option[(Expression, Expression, Boolean)] = None // lEnd >= rStart
    val residual = mutable.ArrayBuffer.empty[Expression]

    conjuncts.foreach {
      case e @ EqualTo(a, b) if contig.isEmpty && a.dataType == StringType =>
        if (leftOnly(a) && rightOnly(b)) contig = Some((a, b))
        else if (leftOnly(b) && rightOnly(a)) contig = Some((b, a))
        else residual += e
      case e @ BinaryComparison(a, b) if integral(a) && integral(b) =>
        // normalize to (leftExpr OP rightExpr)
        val norm: Option[(Expression, Expression, Boolean, Boolean)] = e match {
          case LessThanOrEqual(_, _) if leftOnly(a) && rightOnly(b) => Some((a, b, true, false))
          case LessThan(_, _) if leftOnly(a) && rightOnly(b) => Some((a, b, true, true))
          case GreaterThanOrEqual(_, _) if leftOnly(a) && rightOnly(b) => Some((a, b, false, false))
          case GreaterThan(_, _) if leftOnly(a) && rightOnly(b) => Some((a, b, false, true))
          case LessThanOrEqual(_, _) if leftOnly(b) && rightOnly(a) => Some((b, a, false, false))
          case LessThan(_, _) if leftOnly(b) && rightOnly(a) => Some((b, a, false, true))
          case GreaterThanOrEqual(_, _) if leftOnly(b) && rightOnly(a) => Some((b, a, true, false))
          case GreaterThan(_, _) if leftOnly(b) && rightOnly(a) => Some((b, a, true, true))
          case _ => None
        }
        norm match {
          case Some((l, r, isLe, strict)) if isLe && le.isEmpty => le = Some((l, r, strict))
          case Some((l, r, isLe, strict)) if !isLe && ge.isEmpty => ge = Some((l, r, strict))
          case _ => residual += e
        }
      case e => residual += e
    }

    (le, ge) match {
      case (Some((ls, re, sLe)), Some((lEnd, rs, sGe))) =>
        Some(Extracted(contig, ls, re, sLe, lEnd, rs, sGe, residual.toSeq))
      case _ => None
    }
  }

  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j @ Join(l, r, Inner, Some(_), _)
        if SparkSession.active.conf.get("spark.graft.intervalJoin.enabled", "true") == "true"
          && j.left.stats.sizeInBytes <= maxBuildBytes =>
      extract(j) match {
        case Some(x) =>
          val exec = BroadcastIntervalJoinExec(
            x.contigs, x.lStart, x.lEnd, x.rStart, x.rEnd, x.strictLe, x.strictGe,
            SparkSession.active.conf.get(
              graft.index.IntervalIndexFactory.ConfKey, "superintervals"),
            planLater(l), planLater(r))
          val withResidual =
            if (x.residual.isEmpty) exec
            else FilterExec(x.residual.reduce(And), exec)
          withResidual :: Nil
        case None => Nil
      }
    case _ => Nil
  }
}

/** CollectLeft broadcast interval join: the left child is collected,
  * indexed per contig (sorted starts + prefix-max-end,
  * graft.index.ContigIntervalIndex), broadcast, and probed
  * partition-parallel from the right child — an index probe per row,
  * never a per-contig cross product. Matches the reference's
  * IntervalJoinExec CollectLeft mode (interval_join.rs:394-413) in
  * Spark's physical-operator idiom (BinaryExecNode + UnsafeProjection
  * output). */
case class BroadcastIntervalJoinExec(
    contigs: Option[(Expression, Expression)],
    lStart: Expression, lEnd: Expression,
    rStart: Expression, rEnd: Expression,
    strictLe: Boolean, strictGe: Boolean,
    algorithm: String,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case null => throw new IllegalArgumentException(
      "null interval coordinate in interval join")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val lc = contigs.map(c => BindReferences.bindReference(c._1, left.output))
    val ls = BindReferences.bindReference(lStart, left.output)
    val le = BindReferences.bindReference(lEnd, left.output)
    val rows = left.executeCollect()

    val groups = mutable.HashMap.empty[UTF8String,
      (mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Long], mutable.ArrayBuffer[Int])]
    var i = 0
    while (i < rows.length) {
      val row = rows(i)
      val key = lc match {
        case Some(b) => b.eval(row).asInstanceOf[UTF8String].copy()
        case None => UTF8String.EMPTY_UTF8
      }
      val g = groups.getOrElseUpdate(key,
        (mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty))
      g._1 += asLong(ls.eval(row)); g._2 += asLong(le.eval(row)); g._3 += i
      i += 1
    }
    val indexes: Map[UTF8String, graft.index.IntervalStabber] = groups.map {
      case (k, (s, e, p)) =>
        k -> graft.index.IntervalIndexFactory.build(algorithm, s.toArray, e.toArray, p.toArray)
    }.toMap

    val bcRows = sparkContext.broadcast(rows)
    val bcIdx = sparkContext.broadcast(indexes)
    val rc = contigs.map(c => BindReferences.bindReference(c._2, right.output))
    val rs = BindReferences.bindReference(rStart, right.output)
    val re = BindReferences.bindReference(rEnd, right.output)
    val sLe = strictLe; val sGe = strictGe
    val outAttrs = output

    // Round-robin repartition when the probe scan under-parallelizes
    // (small parquet file -> one partition would serialize the whole
    // probe); mirrors the reference's RoundRobinBatch repartition of
    // the probe side (count_overlaps.rs:143-154). No-op at scale.
    val rightRdd0 = right.execute()
    val target = sparkContext.defaultParallelism
    val rightRdd =
      if (rightRdd0.getNumPartitions < target)
        rightRdd0.map(_.copy()).repartition(target)
      else rightRdd0

    rightRdd.mapPartitions { it =>
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs.map(_.dataType).toArray)
      val leftRows = bcRows.value
      val idxMap = bcIdx.value
      it.flatMap { rrow =>
        val key = rc match {
          case Some(b) => b.eval(rrow).asInstanceOf[UTF8String]
          case None => UTF8String.EMPTY_UTF8
        }
        idxMap.get(key) match {
          case None => Iterator.empty
          case Some(idx) =>
            // predicate: l.start <= qe && l.end >= qs (strict ops fold
            // into the bounds — the reference's minus_one rewrite)
            val qe = asLong(re.eval(rrow)) - (if (sLe) 1L else 0L)
            val qs = asLong(rs.eval(rrow)) + (if (sGe) 1L else 0L)
            val hits = mutable.ArrayBuffer.empty[Int]
            idx.query(qs, qe)(hits += _)
            hits.iterator.map { p => proj(joined(leftRows(p), rrow)) }
        }
      }
    }
  }
}

/** Session-extensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => IntervalJoinStrategy)
}

object Graft {
  /** Runtime enablement on an existing session (no rebuild needed). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(IntervalJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ IntervalJoinStrategy
}
