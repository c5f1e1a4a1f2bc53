package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{FilterOp, IntervalCols}
import graft.index.{ContigIntervalIndex, CountOverlapIndex}

/** Streaming twins of the probe-style interval operators: a static
  * (bounded) interval table builds the broadcast per-contig index
  * once at plan time; the unbounded stream probes it row-by-row — a
  * map-only stateless streaming stage (no watermark, no state store),
  * so the same O(log n + hits) probe cost and partition-parallelism
  * as the batch path carry over to readStream sources unchanged.
  *
  * The reference is batch-only (Boundedness::Bounded everywhere,
  * SURVEY.md §1.1); this is the forward-looking streaming surface for
  * annotate-as-data-arrives pipelines (e.g. aligned reads streaming
  * into coverage/overlap annotation).
  */
object IntervalStreams {

  private def collectIndex(intervals: DataFrame, cols: IntervalCols)
      : Map[String, (Array[Long], Array[Long])] = {
    val rows = intervals.select(
      col(cols.contig), col(cols.start).cast("long"), col(cols.end).cast("long")).collect()
    rows.groupBy(_.getString(0)).map { case (k, rs) =>
      k -> (rs.map(_.getLong(1)), rs.map(_.getLong(2)))
    }
  }

  /** Annotate each streaming row with the number of static intervals
    * overlapping it (`n_overlaps`) — streaming F2. */
  def countOverlaps(
      stream: DataFrame, intervals: DataFrame,
      scols: IntervalCols = IntervalCols.default,
      icols: IntervalCols = IntervalCols.default,
      op: FilterOp = FilterOp.Weak): DataFrame = {
    val idx = collectIndex(intervals, icols).map { case (k, (s, e)) =>
      k -> CountOverlapIndex.build(s, e)
    }
    val bc = stream.sparkSession.sparkContext.broadcast(idx)
    val theOp = op
    val cnt = udf { (contig: String, qs: Long, qe: Long) =>
      bc.value.get(contig) match {
        case Some(i) => val (s, e) = theOp.adjustQuery(qs, qe); i.count(s, e)
        case None => 0L
      }
    }
    stream.withColumn("n_overlaps", cnt(
      col(scols.contig), col(scols.start).cast("long"), col(scols.end).cast("long")))
  }

  /** Filter a stream to rows overlapping at least one static interval
    * (streaming semi-join / F1 left_distinct). */
  def filterOverlapping(
      stream: DataFrame, intervals: DataFrame,
      scols: IntervalCols = IntervalCols.default,
      icols: IntervalCols = IntervalCols.default,
      op: FilterOp = FilterOp.Weak): DataFrame =
    countOverlaps(stream, intervals, scols, icols, op)
      .where(col("n_overlaps") > 0).drop("n_overlaps")
}
