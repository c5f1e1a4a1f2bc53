package graft.ranges

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.core.{FilterOp, IntervalCols}
import graft.index._

/** Broadcast interval join machinery.
  *
  * Mirrors the reference's CollectLeft interval-join design
  * (interval_join.rs:394-413, collect_left_input at :584-668): the
  * build side is collected, grouped by contig, indexed, and shipped to
  * every probe task; the probe side streams partition-parallel and
  * never materializes (Spark iterators are incremental, so the
  * reference's low-memory batch-capping FSM is unnecessary here).
  *
  * Scale notes (100 TB target):
  *  - The BUILD side must fit in driver+executor memory — identical to
  *    the reference's CollectLeft mode and the usual shape of genomic
  *    interval joins (small annotation/target set vs huge reads set).
  *    Callers put the small table on the build side; the probe side is
  *    unbounded and partition-parallel with zero shuffle.
  *  - A per-contig index answers each probe in O(log n + hits): no
  *    per-contig cross product (BASELINE.md bar #3).
  */
object IntervalJoin {

  /** Collected + indexed build side. `rows(i)` is the full row payload
    * for interval position i (positions are assigned in
    * (contig-group, sortKey) order so index payload order is the
    * deterministic tie-break order). */
  final class Build(
      val rows: Array[Array[Any]],
      val indexes: Map[String, ContigIntervalIndex],
      val nearest: Map[String, NearestIndex],
      val counts: Map[String, CountOverlapIndex],
      val cov: Map[String, CoverageIndex]) extends Serializable

  private def asLong(v: Any, colName: String): Long = v match {
    case l: Long  => l
    case i: Int   => i.toLong
    case s: Short => s.toLong
    case null => throw new IllegalArgumentException(
      s"null coordinate in column '$colName' (reference treats null positions as an execution error)")
    case other => throw new IllegalArgumentException(
      s"column '$colName' must be integral, got ${other.getClass.getSimpleName}")
  }

  /** Collect and group the build side by contig.
    *
    * @param tieBreakIdx optional column index used to order intervals
    *   within a contig for deterministic tie-breaks (the reference uses
    *   build-input arrival order, nearest_index.rs metadata; an explicit
    *   column makes results partition-invariant).
    * @param what which index families to build (enumeration / nearest /
    *   count / coverage) — avoids paying for unused structures.
    */
  def collectBuild(
      df: DataFrame,
      cols: IntervalCols,
      tieBreakIdx: Option[Int] = None,
      enumIdx: Boolean = true,
      nearestIdx: Boolean = false,
      countIdx: Boolean = false,
      covIdx: Boolean = false): Build = {

    val schema = df.schema
    val ci = schema.fieldIndex(cols.contig)
    val si = schema.fieldIndex(cols.start)
    val ei = schema.fieldIndex(cols.end)
    val collected = df.collect()

    // group rows by contig, ordered by (tieBreak | arrival)
    val groups = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Array[Any]]]
    collected.foreach { r =>
      val key = r.get(ci).asInstanceOf[String]
      groups.getOrElseUpdate(key, mutable.ArrayBuffer.empty) += r.toSeq.toArray
    }
    tieBreakIdx.foreach { t =>
      groups.values.foreach(_.sortInPlaceBy(a => asLong(a(t), "tieBreak")))
    }

    val allRows = mutable.ArrayBuffer.empty[Array[Any]]
    val enums = Map.newBuilder[String, ContigIntervalIndex]
    val nears = Map.newBuilder[String, NearestIndex]
    val cnts = Map.newBuilder[String, CountOverlapIndex]
    val covs = Map.newBuilder[String, CoverageIndex]
    groups.foreach { case (contig, rows) =>
      val n = rows.length
      val s = new Array[Long](n); val e = new Array[Long](n); val p = new Array[Int](n)
      var i = 0
      while (i < n) {
        s(i) = asLong(rows(i)(si), cols.start)
        e(i) = asLong(rows(i)(ei), cols.end)
        p(i) = allRows.length + i
        i += 1
      }
      allRows ++= rows
      if (enumIdx) enums += contig -> ContigIntervalIndex.build(s, e, p)
      if (nearestIdx) nears += contig -> NearestIndex.build(s, e, p)
      if (countIdx) cnts += contig -> CountOverlapIndex.build(s, e)
      if (covIdx) covs += contig -> CoverageIndex.build(s, e)
    }
    new Build(allRows.toArray, enums.result(), nears.result(), cnts.result(), covs.result())
  }

  private[ranges] def prefixed(schema: StructType, prefix: String, forceNullable: Boolean): Seq[StructField] =
    schema.fields.toSeq.map(f =>
      StructField(prefix + f.name, f.dataType, nullable = f.nullable || forceNullable))

  /** All-pairs overlap join ("join" mode of F1): output =
    * `left_*` columns ++ `right_*` columns (overlap.rs:154-181). The
    * build side is `left`; `right` streams. */
  def overlapPairs(
      left: DataFrame, right: DataFrame,
      lcols: IntervalCols, rcols: IntervalCols,
      op: FilterOp): DataFrame = {

    val spark = left.sparkSession
    val build = collectBuild(left, lcols)
    val bc = spark.sparkContext.broadcast(build)
    val rSchema = right.schema
    val rci = rSchema.fieldIndex(rcols.contig)
    val rsi = rSchema.fieldIndex(rcols.start)
    val rei = rSchema.fieldIndex(rcols.end)
    val outSchema = StructType(
      prefixed(left.schema, "left_", forceNullable = false) ++
      prefixed(rSchema, "right_", forceNullable = false))
    val theOp = op

    val rdd = right.rdd.mapPartitions { it =>
      val b = bc.value
      it.flatMap { r =>
        val idx = b.indexes.getOrElse(r.get(rci).asInstanceOf[String], null)
        if (idx == null) Iterator.empty
        else {
          val (qs, qe) = theOp.adjustQuery(asLong(r.get(rsi), "start"), asLong(r.get(rei), "end"))
          val out = mutable.ArrayBuffer.empty[Row]
          val rvals = r.toSeq
          idx.query(qs, qe) { p =>
            out += Row.fromSeq(b.rows(p).toSeq ++ rvals)
          }
          out.iterator
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** "left" / "left_distinct" modes of F1: emit each probe-side row
    * once per overlap ("left", multiplicity join — overlap.rs:183-203)
    * or once if any overlap exists ("left_distinct", semi-join —
    * overlap.rs:205-226). Only a count index of the build side is
    * broadcast — no row payloads. Here `probe` is the table whose rows
    * are returned and `other` is the indexed side. */
  def overlapExistence(
      probe: DataFrame, other: DataFrame,
      pcols: IntervalCols, ocols: IntervalCols,
      op: FilterOp, distinct: Boolean): DataFrame = {

    val spark = probe.sparkSession
    val build = collectBuild(other, ocols, enumIdx = false, countIdx = true)
    val bc = spark.sparkContext.broadcast(build)
    val pSchema = probe.schema
    val pci = pSchema.fieldIndex(pcols.contig)
    val psi = pSchema.fieldIndex(pcols.start)
    val pei = pSchema.fieldIndex(pcols.end)
    val theOp = op; val isDistinct = distinct

    val rdd = probe.rdd.mapPartitions { it =>
      val b = bc.value
      it.flatMap { r =>
        val idx = b.counts.getOrElse(r.get(pci).asInstanceOf[String], null)
        if (idx == null) Iterator.empty
        else {
          val (qs, qe) = theOp.adjustQuery(asLong(r.get(psi), "start"), asLong(r.get(pei), "end"))
          val n = idx.count(qs, qe)
          if (n <= 0) Iterator.empty
          else if (isDistinct) Iterator.single(r)
          else Iterator.fill(n.toInt)(r)
        }
      }
    }
    spark.createDataFrame(rdd, pSchema)
  }

  /** F2 count_overlaps / F3 coverage: probe-side rows + one Long
    * column. `coverage=true` sums covered basepairs over the MERGED
    * build intervals (interval_tree.rs:104-106,145-152); else counts
    * overlapping build intervals. */
  def annotateCount(
      build: DataFrame, probe: DataFrame,
      bcols: IntervalCols, pcols: IntervalCols,
      op: FilterOp, coverage: Boolean, outName: String): DataFrame = {

    val spark = probe.sparkSession
    val b0 = collectBuild(build, bcols, enumIdx = false,
      countIdx = !coverage, covIdx = coverage)
    val bc = spark.sparkContext.broadcast(b0)
    val pSchema = probe.schema
    val pci = pSchema.fieldIndex(pcols.contig)
    val psi = pSchema.fieldIndex(pcols.start)
    val pei = pSchema.fieldIndex(pcols.end)
    val outSchema = StructType(pSchema.fields :+ StructField(outName, LongType, nullable = false))
    val theOp = op; val isCov = coverage

    val rdd = probe.rdd.mapPartitions { it =>
      val b = bc.value
      it.map { r =>
        val contig = r.get(pci).asInstanceOf[String]
        val (qs, qe) = theOp.adjustQuery(asLong(r.get(psi), "start"), asLong(r.get(pei), "end"))
        val v: Long =
          if (isCov) b.cov.get(contig).map(_.coverage(qs, qe)).getOrElse(0L)
          else b.counts.get(contig).map(_.count(qs, qe)).getOrElse(0L)
        Row.fromSeq(r.toSeq :+ v)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** F4 nearest: for each probe row, up to k nearest build intervals
    * (overlaps first when includeOverlaps, then by distance with the
    * reference's (distance, start, end, position) order). Emits NULL
    * build columns when no candidate exists
    * (tests/integration_test.rs:1302). Output:
    * `left_*` (build) ++ `right_*` (probe) [+ distance Int64]. */
  def nearest(
      build: DataFrame, probe: DataFrame,
      bcols: IntervalCols, pcols: IntervalCols,
      op: FilterOp, k: Int, includeOverlaps: Boolean,
      computeDistance: Boolean, tieBreakCol: Option[String] = None): DataFrame = {

    val spark = probe.sparkSession
    val tIdx = tieBreakCol.map(build.schema.fieldIndex)
    val b0 = collectBuild(build, bcols, tieBreakIdx = tIdx,
      enumIdx = false, nearestIdx = true)
    val bc = spark.sparkContext.broadcast(b0)
    val pSchema = probe.schema
    val pci = pSchema.fieldIndex(pcols.contig)
    val psi = pSchema.fieldIndex(pcols.start)
    val pei = pSchema.fieldIndex(pcols.end)
    val nLeft = build.schema.fields.length
    val outSchema = StructType(
      prefixed(build.schema, "left_", forceNullable = true) ++
      prefixed(pSchema, "right_", forceNullable = true) ++
      (if (computeDistance) Seq(StructField("distance", LongType, nullable = true)) else Nil))
    val theOp = op; val kk = k; val incl = includeOverlaps; val withDist = computeDistance

    val rdd = probe.rdd.mapPartitions { it =>
      val b = bc.value
      val nullLeft: Seq[Any] = Seq.fill(nLeft)(null)
      it.flatMap { r =>
        val contig = r.get(pci).asInstanceOf[String]
        val (qs, qe) = theOp.adjustQuery(asLong(r.get(psi), "start"), asLong(r.get(pei), "end"))
        val rvals = r.toSeq
        val out = mutable.ArrayBuffer.empty[Row]
        b.nearest.get(contig).foreach { idx =>
          idx.nearestK(qs, qe, kk, incl) { (p, d) =>
            val base = b.rows(p).toSeq ++ rvals
            out += Row.fromSeq(if (withDist) base :+ d else base)
          }
        }
        if (out.isEmpty) {
          val base = nullLeft ++ rvals
          out += Row.fromSeq(if (withDist) base :+ null else base)
        }
        out.iterator
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
