package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, IOException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

/** BGZF — the blocked-gzip container BAM uses (SAMv1 spec §4.1):
  * a series of standards-conformant gzip members, each carrying a
  * `BC` extra subfield whose u16 payload (`BSIZE`) is the total
  * compressed block length minus one, so a reader can walk block
  * boundaries without inflating — the property that makes BAM
  * splittable at scale (a task can start at any block boundary).
  * The stream ends with a fixed 28-byte empty-block EOF marker.
  *
  * Pure JDK: raw deflate/inflate via java.util.zip, CRC32 + ISIZE
  * trailer exactly as gzip requires — `GZIPInputStream` can read the
  * output (conformance pinned in BamSuite). */
object Bgzf {

  /** Maximum uncompressed payload per block; the spec caps the
    * COMPRESSED block at 2^16, so stay comfortably under. */
  val MaxBlockData = 60000

  /** The spec's fixed EOF marker: an empty-payload BGZF block. */
  val EofMarker: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff,
    0x06, 0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  /** One BGZF block for `data[off, off+len)` (len <= MaxBlockData). */
  def compressBlock(data: Array[Byte], off: Int, len: Int): Array[Byte] = {
    require(len <= MaxBlockData, s"BGZF block payload $len > $MaxBlockData")
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true) // raw deflate
    deflater.setInput(data, off, len)
    deflater.finish()
    val cbuf = new ByteArrayOutputStream(len / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) {
      val n = deflater.deflate(tmp)
      cbuf.write(tmp, 0, n)
    }
    deflater.end()
    val cdata = cbuf.toByteArray
    val total = 12 + 6 + cdata.length + 8 // header + BC subfield + cdata + crc/isize
    require(total <= 65536, s"BGZF compressed block $total > 65536")
    val crc = new CRC32()
    crc.update(data, off, len)
    val out = new Array[Byte](total)
    // gzip header: magic, CM=deflate, FLG=FEXTRA, MTIME=0, XFL=0, OS=255
    out(0) = 0x1f; out(1) = 0x8b.toByte; out(2) = 8; out(3) = 4
    // bytes 4-9 already zero except OS
    out(9) = 0xff.toByte
    // XLEN=6, subfield SI1='B' SI2='C' SLEN=2, BSIZE = total-1
    out(10) = 6; out(11) = 0
    out(12) = 'B'; out(13) = 'C'; out(14) = 2; out(15) = 0
    val bsize = total - 1
    out(16) = (bsize & 0xff).toByte; out(17) = ((bsize >> 8) & 0xff).toByte
    System.arraycopy(cdata, 0, out, 18, cdata.length)
    val base = 18 + cdata.length
    val c = crc.getValue
    out(base) = (c & 0xff).toByte; out(base + 1) = ((c >> 8) & 0xff).toByte
    out(base + 2) = ((c >> 16) & 0xff).toByte; out(base + 3) = ((c >> 24) & 0xff).toByte
    out(base + 4) = (len & 0xff).toByte; out(base + 5) = ((len >> 8) & 0xff).toByte
    out(base + 6) = ((len >> 16) & 0xff).toByte; out(base + 7) = ((len >> 24) & 0xff).toByte
    out
  }

  /** OutputStream that BGZF-compresses what is written to it and ends
    * with the EOF marker on close. */
  final class BlockOutputStream(sink: OutputStream) extends OutputStream {
    private val buf = new Array[Byte](MaxBlockData)
    private var n = 0
    override def write(b: Int): Unit = {
      buf(n) = b.toByte; n += 1
      if (n == MaxBlockData) flushBlock()
    }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off; var remaining = len
      while (remaining > 0) {
        val take = math.min(remaining, MaxBlockData - n)
        System.arraycopy(b, o, buf, n, take)
        n += take; o += take; remaining -= take
        if (n == MaxBlockData) flushBlock()
      }
    }
    private def flushBlock(): Unit = {
      if (n > 0) { sink.write(compressBlock(buf, 0, n)); n = 0 }
    }
    override def flush(): Unit = { flushBlock(); sink.flush() }
    override def close(): Unit = {
      flushBlock()
      sink.write(EofMarker)
      sink.close()
    }
  }

  /** Sniff whether `in` (positioned at a gzip member start) is BGZF:
    * gzip magic + FEXTRA flag + a `BC` subfield somewhere in the extra
    * field. Resets the stream to its entry position either way. BGZF
    * files are many-member by construction, and the JDK's
    * GZIPInputStream can silently stop at a member boundary when the
    * underlying stream's available() returns 0 with <27 bytes buffered
    * (the classic concatenated-gzip pitfall) — so BGZF must be routed
    * to [[BlockInputStream]], which walks BSIZE and checks CRCs. */
  def sniffBgzf(in: java.io.BufferedInputStream): Boolean = {
    in.mark(12 + 65536)
    try {
      val hdr = new Array[Byte](12)
      var n = 0; var r = 0
      while (n < 12 && r >= 0) { r = in.read(hdr, n, 12 - n); if (r > 0) n += r }
      if (n < 12 || (hdr(0) & 0xff) != 0x1f || (hdr(1) & 0xff) != 0x8b ||
        (hdr(3) & 4) == 0) return false
      val xlen = (hdr(10) & 0xff) | ((hdr(11) & 0xff) << 8)
      val extra = new Array[Byte](xlen)
      n = 0; r = 0
      while (n < xlen && r >= 0) { r = in.read(extra, n, xlen - n); if (r > 0) n += r }
      if (n < xlen) return false
      var i = 0
      while (i + 4 <= xlen) {
        val slen = (extra(i + 2) & 0xff) | ((extra(i + 3) & 0xff) << 8)
        if ((extra(i) & 0xff) == 'B' && (extra(i + 1) & 0xff) == 'C' && slen == 2)
          return true
        i += 4 + slen
      }
      false
    } finally in.reset()
  }

  /** InputStream over the inflated bytes of a BGZF stream. Walks
    * blocks via BSIZE (no speculative inflation); tolerates the EOF
    * marker and plain stream end.
    *
    * `baseOffset` is the COMPRESSED offset of the source's current
    * position in its containing file, letting [[nextVirtualOffset]]
    * report absolute BGZF virtual offsets
    * (`compressed block start << 16 | offset within inflated block` —
    * the .bai convention) for a stream opened mid-file via seek. */
  final class BlockInputStream(source: InputStream, baseOffset: Long = 0L)
      extends InputStream {
    private var block: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private var done = false
    private var consumed = 0L      // compressed bytes read from source
    private var blockStart = baseOffset // file offset of the current block

    private def readFully(buf: Array[Byte], off: Int, len: Int): Boolean = {
      var o = off; var remaining = len
      while (remaining > 0) {
        val n = source.read(buf, o, remaining)
        if (n < 0) {
          if (o == off) return false // clean block boundary EOF
          throw new EOFException("truncated BGZF block")
        }
        consumed += n
        o += n; remaining -= n
      }
      true
    }

    /** Absolute virtual offset of the NEXT byte this stream will
      * return; Long.MaxValue at EOF. Loads the next block if the
      * current one is exhausted, so the offset is always canonical
      * (in-block position < block length). */
    def nextVirtualOffset: Long = {
      while (pos >= block.length) { if (done || !nextBlock()) return Long.MaxValue }
      (blockStart << 16) | pos.toLong
    }

    private def nextBlock(): Boolean = {
      val startAbs = baseOffset + consumed
      val header = new Array[Byte](18)
      if (!readFully(header, 0, 12)) { done = true; return false }
      if ((header(0) & 0xff) != 0x1f || (header(1) & 0xff) != 0x8b)
        throw new IOException("not a BGZF/gzip block (bad magic)")
      if ((header(3) & 4) == 0)
        throw new IOException("gzip member without FEXTRA — not BGZF")
      val xlen = (header(10) & 0xff) | ((header(11) & 0xff) << 8)
      // the BC subfield alone is 6 bytes, so conformant BGZF always
      // has XLEN >= 6 — and we batch-read 6 extra bytes below
      if (xlen < 6) throw new IOException(s"BGZF XLEN $xlen < 6")
      if (!readFully(header, 12, 6)) throw new EOFException("truncated BGZF header")
      // scan extra subfields for BC (we already read 6 extra bytes)
      val extra = new Array[Byte](xlen)
      System.arraycopy(header, 12, extra, 0, 6)
      if (xlen > 6 && !readFully(extra, 6, xlen - 6))
        throw new EOFException("truncated BGZF extra field")
      var bsize = -1
      var i = 0
      while (i + 4 <= xlen && bsize < 0) {
        val si1 = extra(i) & 0xff; val si2 = extra(i + 1) & 0xff
        val slen = (extra(i + 2) & 0xff) | ((extra(i + 3) & 0xff) << 8)
        if (si1 == 'B' && si2 == 'C' && slen == 2)
          bsize = (extra(i + 4) & 0xff) | ((extra(i + 5) & 0xff) << 8)
        i += 4 + slen
      }
      if (bsize < 0) throw new IOException("BGZF block missing BC subfield")
      val rest = bsize + 1 - 12 - xlen // cdata + crc + isize
      val body = new Array[Byte](rest)
      if (!readFully(body, 0, rest)) throw new EOFException("truncated BGZF body")
      val isize = (body(rest - 4) & 0xff) | ((body(rest - 3) & 0xff) << 8) |
        ((body(rest - 2) & 0xff) << 16) | ((body(rest - 1) & 0xff) << 24)
      if (isize == 0) return nextBlock() // EOF marker / empty block: keep walking
      val inflater = new Inflater(true)
      inflater.setInput(body, 0, rest - 8)
      val out = new Array[Byte](isize)
      var o = 0
      while (o < isize && !inflater.finished()) o += inflater.inflate(out, o, isize - o)
      inflater.end()
      if (o != isize) throw new IOException(s"BGZF inflate short: $o of $isize")
      val crc = new CRC32()
      crc.update(out, 0, isize)
      val want = (body(rest - 8) & 0xffL) | ((body(rest - 7) & 0xffL) << 8) |
        ((body(rest - 6) & 0xffL) << 16) | ((body(rest - 5) & 0xffL) << 24)
      if (crc.getValue != want) throw new IOException("BGZF CRC mismatch")
      block = out; pos = 0; blockStart = startAbs
      true
    }

    override def read(): Int = {
      while (pos >= block.length) { if (done || !nextBlock()) return -1 }
      val b = block(pos) & 0xff; pos += 1; b
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      while (pos >= block.length) { if (done || !nextBlock()) return -1 }
      val take = math.min(len, block.length - pos)
      System.arraycopy(block, pos, b, off, take)
      pos += take
      take
    }
    override def close(): Unit = source.close()
  }
}
