package graft.pileup

import scala.collection.mutable.ArrayBuffer

/** CIGAR walking for depth-of-coverage.
  *
  * Op semantics (reference pileup/src/cigar.rs:41-66,101-118):
  * `M`,`X`,`=` consume reference AND emit coverage; `D`,`N` consume
  * reference without coverage; `I`,`S`,`H`,`P` consume nothing.
  * Binary CIGARs are packed little-endian u32 ops `len<<4 | op`
  * (cigar.rs:170-210) with op codes M=0 I=1 D=2 N=3 S=4 H=5 P=6 ==7 X=8.
  */
object Cigar {

  /** Coverage segments [s, e) in reference coordinates for a read
    * aligned at `start` (0-based). Adjacent M runs split by I (which
    * consumes nothing) coalesce; runs split by D/N do not. */
  def coveredSegments(start: Long, cigar: String): Seq[(Long, Long)] = {
    val out = ArrayBuffer.empty[(Long, Long)]
    var pos = start
    var segStart = -1L
    var i = 0
    val n = cigar.length
    var len = 0L
    while (i < n) {
      val c = cigar.charAt(i)
      if (c >= '0' && c <= '9') {
        len = len * 10 + (c - '0')
      } else {
        c match {
          case 'M' | 'X' | '=' =>
            if (segStart < 0) segStart = pos
            pos += len
          case 'D' | 'N' =>
            if (segStart >= 0) { out += ((segStart, pos)); segStart = -1L }
            pos += len
          case 'I' | 'S' | 'H' | 'P' => // consumes nothing
          case other =>
            throw new IllegalArgumentException(s"bad CIGAR op '$other' in '$cigar'")
        }
        len = 0L
      }
      i += 1
    }
    if (segStart >= 0) out += ((segStart, pos))
    out.toSeq
  }

  /** Binary packed form: little-endian u32 per op, `len<<4 | op`. */
  def coveredSegmentsBinary(start: Long, packed: Array[Byte]): Seq[(Long, Long)] = {
    val sb = new StringBuilder
    var i = 0
    val ops = "MIDNSHP=X"
    while (i + 3 < packed.length) {
      val v = (packed(i) & 0xffL) | ((packed(i + 1) & 0xffL) << 8) |
              ((packed(i + 2) & 0xffL) << 16) | ((packed(i + 3) & 0xffL) << 24)
      val op = (v & 0xf).toInt
      val len = v >>> 4
      require(op < ops.length, s"bad packed CIGAR op code $op")
      sb.append(len).append(ops.charAt(op))
      i += 4
    }
    coveredSegments(start, sb.toString)
  }

  /** SAM-flag + MAPQ read filter (reference pileup/src/filter.rs:1-34):
    * keep iff `(flags & filterFlag) == 0 && mapq >= minMapq`;
    * default mask 1796 = unmapped|secondary|qcfail|dup. */
  def passes(flags: Int, mapq: Int, filterFlag: Int = 1796, minMapq: Int = 0): Boolean =
    (flags & filterFlag) == 0 && mapq >= minMapq
}
