package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.unsafe.Platform

/** Broadcast-friendly container for a collected build-side row array.
  *
  * `sc.broadcast(Array[InternalRow])` Java-serializes every UnsafeRow
  * as its own Externalizable object — ~0.33 s of driver time per 600k
  * rows at sf0.1, paid on every broadcast-index build. Packing the
  * rows into ONE byte block plus an offsets array serializes at
  * memcpy speed, and unpacking is zero-copy: each row is an UnsafeRow
  * POINTER into the shared block (`pointTo`), materialized once per
  * deserialized instance (once per executor; once total in local
  * mode, where the broadcast value object is shared).
  *
  * Rows that are not UnsafeRows (exotic plans) fall back to carrying
  * the raw array — same semantics, old serialization cost. */
sealed trait RowBlock extends Serializable {
  def rows: Array[InternalRow]
}

private final class PackedRowBlock(
    bytes: Array[Byte], offsets: Array[Int], numFields: Int) extends RowBlock {
  @transient private lazy val unpacked: Array[InternalRow] = {
    val out = new Array[InternalRow](offsets.length - 1)
    var i = 0
    while (i < out.length) {
      val r = new UnsafeRow(numFields)
      r.pointTo(bytes, Platform.BYTE_ARRAY_OFFSET + offsets(i),
        offsets(i + 1) - offsets(i))
      out(i) = r
      i += 1
    }
    out
  }
  override def rows: Array[InternalRow] = unpacked
}

private final class RawRowBlock(val rows: Array[InternalRow]) extends RowBlock

object RowBlock {
  def apply(rows: Array[InternalRow], numFields: Int): RowBlock = {
    var total = 0L
    var i = 0
    while (i < rows.length) {
      rows(i) match {
        case u: UnsafeRow => total += u.getSizeInBytes
        case _ => return new RawRowBlock(rows)
      }
      i += 1
    }
    // a >2 GB block cannot index with Int offsets — keep the raw array
    if (total > Int.MaxValue - 16L) return new RawRowBlock(rows)
    val bytes = new Array[Byte](total.toInt)
    val offsets = new Array[Int](rows.length + 1)
    var pos = 0
    i = 0
    while (i < rows.length) {
      val u = rows(i).asInstanceOf[UnsafeRow]
      u.writeToMemory(bytes, Platform.BYTE_ARRAY_OFFSET + pos)
      offsets(i) = pos
      pos += u.getSizeInBytes
      i += 1
    }
    offsets(rows.length) = pos
    new PackedRowBlock(bytes, offsets, numFields)
  }
}
