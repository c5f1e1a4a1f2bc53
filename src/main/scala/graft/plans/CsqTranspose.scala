package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass CSQ parse + TRANSPOSE: the rendered per-variant CSQ
  * string ("f1|f2|...,f1|f2|...") becomes `array<array<string>>`
  * indexed FIELD-major — `result[k][i]` = field k+1 of entry i+1 — so
  * every downstream per-field column is a plain O(1) `element_at`
  * instead of its own `transform(split(...), ...)` higher-order
  * function (the 87-column typed frame ran ~80 interpreted HOFs per
  * variant in a final stage AQE had coalesced to ONE partition —
  * 5.4 s serial at bench scale). Fields beyond an entry's own count
  * yield null (element_at past-the-end parity); an empty input
  * renders nFields empty arrays so field slots are empty and the
  * entry count (inner size) is 0. */
case class CsqTranspose(child: Expression, nFields: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    ArrayType(StringType, containsNull = true), containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_csq_transpose"

  def transpose(csq: UTF8String): GenericArrayData = {
    val s = csq.toString
    if (s.isEmpty) {
      val empty: AnyRef = new GenericArrayData(Array.empty[Any])
      return new GenericArrayData(Array.fill[AnyRef](nFields)(empty))
    }
    val entries = s.split(",", -1)
    val n = entries.length
    val cols = Array.fill(nFields)(new Array[AnyRef](n))
    var i = 0
    while (i < n) {
      val fields = entries(i).split("\\|", -1)
      var k = 0
      while (k < nFields) {
        cols(k)(i) = if (k < fields.length) UTF8String.fromString(fields(k)) else null
        k += 1
      }
      i += 1
    }
    new GenericArrayData(cols.map(c => new GenericArrayData(c): AnyRef))
  }

  override protected def nullSafeEval(v: Any): Any =
    transpose(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCsqTranspose", this, classOf[CsqTranspose].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.transpose($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
