package graft.core

/** Interval-overlap convention, mirroring the reference's `FilterOp`
  * (reference: datafusion/bio-function-ranges/src/filter_op.rs:1-11).
  *
  *  - [[FilterOp.Weak]]   — 1-based, closed intervals. `a` overlaps `b`
  *    iff `a.start <= b.end && a.end >= b.start`.
  *  - [[FilterOp.Strict]] — 0-based, half-open. Same predicate with the
  *    equality dropped: `a.start < b.end && a.end > b.start`
  *    (reference: ranges/src/overlap.rs:260-264 drops the `=` from the
  *    generated SQL; interval_tree.rs:185-188 shrinks the query inward).
  */
sealed trait FilterOp {
  /** Shrink a stabbing query `[qs, qe]` so a closed-interval index
    * answers the strict predicate (reference interval_tree.rs:185-188). */
  def adjustQuery(qs: Long, qe: Long): (Long, Long)
  def isStrict: Boolean
}

object FilterOp {
  case object Weak extends FilterOp {
    def adjustQuery(qs: Long, qe: Long): (Long, Long) = (qs, qe)
    def isStrict: Boolean = false
  }
  case object Strict extends FilterOp {
    def adjustQuery(qs: Long, qe: Long): (Long, Long) = (qs + 1, qe - 1)
    def isStrict: Boolean = true
  }

  def apply(s: String): FilterOp = s.toLowerCase match {
    case "weak"   => Weak
    case "strict" => Strict
    case other => throw new IllegalArgumentException(
      s"filter_op must be 'weak' or 'strict', got '$other'")
  }
}

/** Names of the (contig, start, end) triple identifying intervals in a
  * table. Default matches the reference
  * (ranges/src/table_function.rs:36). */
final case class IntervalCols(
    contig: String = "contig",
    start: String = "pos_start",
    end: String = "pos_end")

object IntervalCols {
  val default: IntervalCols = IntervalCols()
}
