package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.FilterOp
import graft.index.IntervalStabber

/** Native Catalyst expression for the broadcast-index interval probe —
  * the codegen tier of the extension ladder (a `doGenCode` Expression
  * beats the Scala UDF it replaces: no UTF8String->String conversion,
  * no boxing through the Function3 closure, no
  * CatalystTypeConverters on the result; generated code calls
  * [[probe]] directly and the int hits land in an UnsafeArrayData).
  *
  * Returns the build-side row indices whose interval overlaps
  * [start, end] on `contig` — consumed by `explode` + a broadcast
  * hash join (IntervalJoin.overlapPairs). Strict comparators fold
  * into the query bounds via [[FilterOp.adjustQuery]], the same
  * minus-one rewrite the reference applies
  * (physical_planner/intervals.rs:63-124). */
case class IntervalProbe(
    contig: Expression, start: Expression, end: Expression,
    bc: Broadcast[Map[String, IntervalStabber]],
    op: FilterOp) extends TernaryExpression {

  override def first: Expression = contig
  override def second: Expression = start
  override def third: Expression = end
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  // Children may come from nullable schemas (e.g. the VCF reader); the
  // TernaryExpression null contract then yields NULL, which a
  // downstream explode treats as no match. Claiming nullable=false
  // here would make the codegen skip the child null checks and NPE.
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "graft_interval_probe"

  private lazy val empty = UnsafeArrayData.fromPrimitiveArray(Array.empty[Int])

  def probe(c: UTF8String, qs0: Long, qe0: Long): ArrayData = {
    val idx = bc.value.getOrElse(c.toString, null)
    if (idx == null) empty
    else {
      val (qs, qe) = op.adjustQuery(qs0, qe0)
      val out = new scala.collection.mutable.ArrayBuffer[Int]
      idx.query(qs, qe)(out += _)
      UnsafeArrayData.fromPrimitiveArray(out.toArray)
    }
  }

  override protected def nullSafeEval(c: Any, s: Any, e: Any): Any =
    probe(c.asInstanceOf[UTF8String], s.asInstanceOf[Long], e.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftProbe", this, classOf[IntervalProbe].getName)
    nullSafeCodeGen(ctx, ev, (c, s, e) =>
      s"${ev.value} = $ref.probe($c, $s, $e);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(contig = newFirst, start = newSecond, end = newThird)
}
