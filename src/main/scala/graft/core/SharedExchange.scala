package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, rand, xxhash64}

/** Materialization barrier for a frame with several consumers: an
  * exchange node Catalyst's ReuseExchange shares, so the subplan below
  * runs ONCE instead of once per consumer. Two traps make a plain
  * repartition insufficient (measured 3x task time at sf0.1 when the
  * island-sweep hull frame's reuse was lost):
  *  - column pruning would give each consumer a different projection
  *    under the exchange, so the subplans stop canonicalizing
  *    identically and ReuseExchange never fires — the always-true
  *    filter references every column and blocks pushdown below the
  *    exchange;
  *  - a repartition on keys the child's output partitioning already
  *    carries is REMOVED as redundant — pick `keys` that differ from
  *    it (or rely on a consumer needing exactly this clustering).
  * The filter must be (a) non-deterministic, or PushDownPredicates
  * moves it below the repartition and per-consumer projections slip
  * between them, and (b) reference every column, or pruning slides a
  * projection under it; it is always TRUE by construction (hash%2 in
  * {-1,0,1}, rand in [0,1) — the sum exceeds -10 for every row).
  * Unlike persist(), nothing is cached across invocations — a re-run
  * re-reads the sources (registry-staleness-safe). */
object SharedExchange {
  def apply(df: DataFrame, keys: Column*): DataFrame =
    barriered(df.repartition(keys: _*))

  /** Explicit-width variant: a repartition on keys the child's output
    * partitioning ALREADY carries is normally removed as redundant —
    * a different partition count keeps it (and with it the reuse
    * point) while letting consumers whose grouping extends `keys`
    * aggregate in place on the exchange's own clustering. */
  def apply(df: DataFrame, numPartitions: Int, keys: Column*): DataFrame =
    barriered(df.repartition(numPartitions, keys: _*))

  private def barriered(df: DataFrame): DataFrame = {
    val barrier =
      (xxhash64(df.columns.map(col).toIndexedSeq: _*) % 2 + rand()) > lit(-10d)
    df.where(barrier)
  }
}
