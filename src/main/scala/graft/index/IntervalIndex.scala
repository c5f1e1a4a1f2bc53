package graft.index

import scala.collection.mutable.ArrayBuffer

/** One stabbing-query dispatch over interchangeable index layouts —
  * the reference keeps 7 algorithms behind a single
  * `get(key,start,end,f)` (interval_join.rs:849-901, selected via
  * `SET bio.interval_join_algorithm`); here the algorithm is chosen
  * per session with `spark.graft.intervalJoin.algorithm`
  * (see [[IntervalIndexFactory]]). */
trait IntervalStabber extends Serializable {
  /** Visit payloads of all intervals overlapping [qs, qe] (closed),
    * in deterministic (start, end, rank) order. */
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit
}

/** Per-contig interval stabbing index: intervals sorted by
  * `(start, end, position)` plus a prefix-max-end array — the
  * "superintervals-lite" layout from SURVEY.md §2 J7 (reference keeps
  * several interchangeable index impls behind one `get(key,start,end,f)`
  * dispatch, interval_join.rs:849-901; this is the sorted-arrays one).
  *
  * Query `[qs, qe]` (closed): all `i` with
  * `starts(i) <= qe && ends(i) >= qs`. We binary-search the last
  * start `<= qe`, then scan backwards, pruning with the prefix max of
  * `ends` (if `maxEnds(i) < qs` no `j <= i` can match).
  *
  * Coordinates are Long (the reference's sweep path uses i64; its
  * interval-join path narrows to i32 with an overflow error — we stay
  * on Long everywhere, which is strictly more permissive).
  */
final class ContigIntervalIndex(
    val starts: Array[Long],
    val ends: Array[Long],
    val maxEnds: Array[Long],
    /** caller-supplied payload (e.g. broadcast-join row index), in
      * (start, end, rank) order */
    val payload: Array[Int],
    /** tie-break rank per interval, same order (the reference's
      * insertion-order "position" metadata) */
    val rank: Array[Long]) extends IntervalStabber {

  def size: Int = starts.length

  /** Visit payloads of all intervals overlapping [qs, qe] (closed), in
    * (start, end, position) order. */
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    // NOTE: a strict-adjusted query may have qs = qe + 2 (point probe);
    // the predicate `start <= qe && end >= qs` then selects intervals
    // STRICTLY containing the point — do not early-return on qs > qe.
    var i = upperBound(starts, qe) - 1
    // collect backwards, then emit forwards for deterministic order
    var lo = i
    while (lo >= 0 && maxEnds(lo) >= qs) lo -= 1
    var j = lo + 1
    while (j <= i) {
      if (ends(j) >= qs) f(payload(j))
      j += 1
    }
  }

  def countOverlaps(qs: Long, qe: Long): Long = {
    var n = 0L
    query(qs, qe)(_ => n += 1)
    n
  }

  /** first index with arr(i) > key */
  @inline private def upperBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }
}

object ContigIntervalIndex {
  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): ContigIntervalIndex =
    build(s, e, payload, payload.map(_.toLong))

  /** Build from parallel arrays (not necessarily sorted). `rank(i)` is
    * interval i's tie-break order (the reference's insertion-order
    * metadata); `payload(i)` is the value emitted on match. */
  def build(s: Array[Long], e: Array[Long], payload: Array[Int], rank: Array[Long]): ContigIntervalIndex = {
    val n = s.length
    val order = Array.range(0, n).sortInPlaceWith { (a, b) =>
      if (s(a) != s(b)) s(a) < s(b)
      else if (e(a) != e(b)) e(a) < e(b)
      else rank(a) < rank(b)
    }
    val ss = new Array[Long](n); val ee = new Array[Long](n)
    val pp = new Array[Int](n); val rr = new Array[Long](n); val mx = new Array[Long](n)
    var i = 0; var running = Long.MinValue
    while (i < n) {
      val o = order(i)
      ss(i) = s(o); ee(i) = e(o); pp(i) = payload(o); rr(i) = rank(o)
      if (ee(i) > running) running = ee(i)
      mx(i) = running
      i += 1
    }
    new ContigIntervalIndex(ss, ee, mx, pp, rr)
  }
}

/** Naive linear-scan stabber over the same sorted layout — the
  * testing/verification fallback (the reference ships rust-bio's
  * plain IntervalTree for the same purpose). Same deterministic
  * emission order as [[ContigIntervalIndex]]; O(n) per probe. */
final class LinearIntervalIndex(
    val starts: Array[Long], val ends: Array[Long],
    val payload: Array[Int]) extends IntervalStabber {
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    var i = 0
    while (i < starts.length) {
      if (starts(i) <= qe && ends(i) >= qs) f(payload(i))
      i += 1
    }
  }
}

/** Eytzinger-layout stabber: the canonical sorted-arrays layout of
  * [[ContigIntervalIndex]], but the upper-bound search over `starts`
  * walks a BFS-ordered (eytzinger) copy — one branchless comparison
  * per level with the next cache line prefetchable, the layout the
  * reference offers as its cache-friendly algorithm alternative
  * (interval_join.rs:849-901 keeps 7 such impls behind one dispatch).
  * Emission order and results are identical to superintervals; only
  * the search memory-access pattern differs. */
final class EytzingerIntervalIndex(
    val starts: Array[Long], val ends: Array[Long], val maxEnds: Array[Long],
    val payload: Array[Int],
    /** 1-based BFS-ordered copy of `starts` */
    val eyt: Array[Long],
    /** sorted-array position of each eytzinger slot */
    val eytPos: Array[Int]) extends IntervalStabber {

  private val n = starts.length

  /** first sorted index with starts(i) > key, via branchless
    * eytzinger descent: each level appends a comparison bit (1 = went
    * right, node value <= key); the predecessor is the node of the
    * LAST right turn, recovered by shifting past the trailing left
    * turns and that right turn (k >> (ntz(k) + 1)). k = 0 means no
    * element <= key. */
  @inline private def upperBound(key: Long): Int = {
    var k = 1
    while (k <= n) k = 2 * k + (if (eyt(k) <= key) 1 else 0)
    k >>= (Integer.numberOfTrailingZeros(k) + 1)
    if (k == 0) 0 else eytPos(k) + 1
  }

  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    val i = upperBound(qe) - 1
    var lo = i
    while (lo >= 0 && maxEnds(lo) >= qs) lo -= 1
    var j = lo + 1
    while (j <= i) {
      if (ends(j) >= qs) f(payload(j))
      j += 1
    }
  }
}

object EytzingerIntervalIndex {
  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): EytzingerIntervalIndex = {
    val c = ContigIntervalIndex.build(s, e, payload)
    val n = c.starts.length
    val eyt = new Array[Long](n + 1)
    val pos = new Array[Int](n + 1)
    // in-order fill of the BFS tree yields the sorted sequence
    var next = 0
    def fill(k: Int): Unit = if (k <= n) {
      fill(2 * k)
      eyt(k) = c.starts(next); pos(k) = next; next += 1
      fill(2 * k + 1)
    }
    fill(1)
    new EytzingerIntervalIndex(c.starts, c.ends, c.maxEnds, c.payload, eyt, pos)
  }
}

/** Lapper-layout stabber (the rust-lapper / nim-lapper algorithm
  * family several of the reference's index impls derive from):
  * intervals sorted by start, the query backs off by the MAXIMUM
  * interval length to find the scan window's left edge, then scans
  * forward while `start <= qe`. Degrades when one huge interval
  * inflates the back-off (the known lapper weakness the prefix-max-end
  * layout fixes) but is branch-simple and append-friendly. Emission
  * order matches the canonical sorted order. */
final class LapperIntervalIndex(
    val starts: Array[Long], val ends: Array[Long],
    val payload: Array[Int], val maxLen: Long) extends IntervalStabber {
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    var j = lowerBound(starts, qs - maxLen)
    while (j < starts.length && starts(j) <= qe) {
      if (ends(j) >= qs) f(payload(j))
      j += 1
    }
  }
  /** first index with arr(i) >= key */
  @inline private def lowerBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }
}

object LapperIntervalIndex {
  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): LapperIntervalIndex = {
    val c = ContigIntervalIndex.build(s, e, payload)
    var ml = 0L
    var i = 0
    while (i < c.starts.length) {
      val len = c.ends(i) - c.starts(i)
      if (len > ml) ml = len
      i += 1
    }
    new LapperIntervalIndex(c.starts, c.ends, c.payload, ml)
  }
}

/** One component of an [[AiListIntervalIndex]]: a start-sorted slice
  * with its own running max-end and each interval's position in the
  * CANONICAL (start, end, rank) order, so matches can be re-emitted in
  * the shared deterministic order. */
final class AiListComponent(
    val starts: Array[Long], val ends: Array[Long],
    val maxEnds: Array[Long], val canon: Array[Int]) extends Serializable {
  /** Collect canonical positions of intervals overlapping [qs, qe]. */
  def collect(qs: Long, qe: Long, out: ArrayBuffer[Int]): Unit = {
    var i = {
      var lo = 0; var hi = starts.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (starts(mid) <= qe) lo = mid + 1 else hi = mid
      }
      lo - 1
    }
    while (i >= 0 && maxEnds(i) >= qs) {
      if (ends(i) >= qs) out += canon(i)
      i -= 1
    }
  }
}

/** AIList stabber (Augmented Interval List — Feng, Ratan & Sheffield
  * 2019, doi:10.1093/bioinformatics/btz407; one of the reference's
  * interchangeable layout alternatives, interval_join.rs:849-901):
  * the start-sorted list is decomposed into a few components by
  * repeatedly EXTRACTING intervals that cover many of their
  * successors — the long intervals that make a plain backward
  * max-end scan degenerate. Each component keeps its own running
  * max-end, so every per-component backward scan terminates quickly
  * regardless of length skew. Matches are gathered across components
  * and emitted in the canonical (start, end, rank) order shared by
  * every other layout. */
final class AiListIntervalIndex(
    val comps: Array[AiListComponent],
    val payload: Array[Int]) extends IntervalStabber {
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    val hits = new ArrayBuffer[Int](16)
    var c = 0
    while (c < comps.length) { comps(c).collect(qs, qe, hits); c += 1 }
    val a = hits.toArray
    java.util.Arrays.sort(a)
    var i = 0
    while (i < a.length) { f(payload(a(i))); i += 1 }
  }
}

object AiListIntervalIndex {
  /** Paper defaults: an interval is extracted when it covers at least
    * `MinCover` of its next `Lookahead` successors; at most `MaxComps`
    * components, and decomposition stops once a slice is small. */
  private val Lookahead = 20
  private val MinCover = 10
  private val MaxComps = 10
  private val MinSize = 64

  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): AiListIntervalIndex = {
    val c = ContigIntervalIndex.build(s, e, payload)
    val comps = ArrayBuffer.empty[AiListComponent]
    var idx = Array.range(0, c.starts.length) // canonical positions, start-sorted
    while (idx.nonEmpty) {
      val last = comps.length == MaxComps - 1 || idx.length < MinSize
      val keep = ArrayBuffer.empty[Int]
      val extracted = ArrayBuffer.empty[Int]
      var i = 0
      while (i < idx.length) {
        if (last) keep += idx(i)
        else {
          var cov = 0
          var j = i + 1
          val lim = math.min(idx.length, i + 1 + Lookahead)
          while (j < lim) {
            if (c.ends(idx(j)) <= c.ends(idx(i))) cov += 1
            j += 1
          }
          if (cov >= MinCover) extracted += idx(i) else keep += idx(i)
        }
        i += 1
      }
      val ks = keep.toArray
      val cs = new Array[Long](ks.length); val ce = new Array[Long](ks.length)
      val mx = new Array[Long](ks.length)
      var running = Long.MinValue
      var k = 0
      while (k < ks.length) {
        cs(k) = c.starts(ks(k)); ce(k) = c.ends(ks(k))
        if (ce(k) > running) running = ce(k)
        mx(k) = running
        k += 1
      }
      comps += new AiListComponent(cs, ce, mx, ks)
      idx = extracted.toArray
    }
    new AiListIntervalIndex(comps.toArray, c.payload)
  }
}

/** COITrees-style implicit augmented interval tree (the reference's
  * DEFAULT layout, session_context.rs:60-101 `Algorithm::Coitrees`;
  * cgranges lineage): the canonical (start, end, rank)-sorted array
  * doubles as an implicit balanced BST via midpoint recursion, with a
  * subtree-max-end augmentation stored at each midpoint. A probe
  * recurses from the root: a subtree is pruned when its max end is
  * below `qs` (nothing can reach the query) or when the node's start
  * exceeds `qe` (the right subtree starts even later). In-order visits
  * ascend the canonical index order, so emission matches every other
  * layout without a sort. */
final class CoitreesIntervalIndex(
    val starts: Array[Long], val ends: Array[Long],
    /** max end over the implicit subtree rooted at each midpoint */
    val subMax: Array[Long],
    val payload: Array[Int]) extends IntervalStabber {
  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = visit(0, starts.length - 1, qs, qe, f)

  private def visit(lo: Int, hi: Int, qs: Long, qe: Long, f: Int => Unit): Unit = {
    if (lo > hi) return
    val mid = (lo + hi) >>> 1
    if (subMax(mid) < qs) return       // whole subtree ends before query
    visit(lo, mid - 1, qs, qe, f)
    if (starts(mid) <= qe) {
      if (ends(mid) >= qs) f(payload(mid))
      visit(mid + 1, hi, qs, qe, f)    // right subtree may still start <= qe
    }                                   // else: right starts even later — prune
  }
}

object CoitreesIntervalIndex {
  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): CoitreesIntervalIndex = {
    val c = ContigIntervalIndex.build(s, e, payload)
    val subMax = new Array[Long](c.starts.length)
    def fill(lo: Int, hi: Int): Long = {
      if (lo > hi) return Long.MinValue
      val mid = (lo + hi) >>> 1
      val m = math.max(c.ends(mid), math.max(fill(lo, mid - 1), fill(mid + 1, hi)))
      subMax(mid) = m
      m
    }
    fill(0, c.starts.length - 1)
    new CoitreesIntervalIndex(c.starts, c.ends, subMax, c.payload)
  }
}

/** J3 algorithm selection: one factory keyed by the session config
  * `spark.graft.intervalJoin.algorithm` —
  * `superintervals` (default, sorted arrays + prefix-max-end),
  * `eytzinger` (same layout, branchless BFS-ordered search),
  * `lapper` (start-sorted + max-length back-off),
  * `ailist` (augmented interval list, skew-robust decomposition),
  * `coitrees` (implicit augmented interval tree — the reference's
  * default), or `linear` (naive scan, for verification). */
/** Implicit-BST stabber over the canonical sorted arrays — rust-bio's
  * `ArrayBackedIntervalTree`, the reference's `arrayintervaltree`
  * algorithm (session_context.rs:61-70, interval_join.rs:703-814): the
  * sorted interval array is viewed as a balanced BST by recursive
  * midpoint, each node annotated with its subtree's max end. A query
  * prunes a subtree when its max end < qs and skips the right child
  * when the node's start > qe; in-order descent emits hits in the
  * canonical (start, end, rank) order. O(log n + k) per probe, no
  * pointer chasing — the same flat-array idea as coitrees but with
  * midpoint topology instead of van Emde Boas layout. */
final class ArrayTreeIntervalIndex(
    val starts: Array[Long], val ends: Array[Long],
    val payload: Array[Int],
    /** subtreeMax(mid) = max end over the subtree rooted at the
      * midpoint node of its range */
    val subtreeMax: Array[Long]) extends IntervalStabber {

  def query(qs: Long, qe: Long)(f: Int => Unit): Unit = {
    def rec(lo: Int, hi: Int): Unit = {
      if (lo >= hi) return
      val mid = (lo + hi) >>> 1
      if (subtreeMax(mid) < qs) return
      rec(lo, mid)
      if (starts(mid) <= qe) {
        if (ends(mid) >= qs) f(payload(mid))
        rec(mid + 1, hi)
      }
    }
    rec(0, starts.length)
  }
}

object ArrayTreeIntervalIndex {
  def build(s: Array[Long], e: Array[Long], payload: Array[Int]): ArrayTreeIntervalIndex = {
    // canonical (start, end, rank) order shared by every layout
    val c = ContigIntervalIndex.build(s, e, payload)
    val n = c.starts.length
    val subMax = new Array[Long](n)
    def rec(lo: Int, hi: Int): Long = {
      if (lo >= hi) return Long.MinValue
      val mid = (lo + hi) >>> 1
      val m = math.max(c.ends(mid), math.max(rec(lo, mid), rec(mid + 1, hi)))
      subMax(mid) = m
      m
    }
    rec(0, n)
    new ArrayTreeIntervalIndex(c.starts, c.ends, c.payload, subMax)
  }
}

object IntervalIndexFactory {
  val ConfKey = "spark.graft.intervalJoin.algorithm"

  def build(algo: String, s: Array[Long], e: Array[Long], payload: Array[Int]): IntervalStabber =
    algo match {
      case "linear" =>
        // reuse the canonical sort so emission order matches
        val c = ContigIntervalIndex.build(s, e, payload)
        new LinearIntervalIndex(c.starts, c.ends, c.payload)
      case "eytzinger" => EytzingerIntervalIndex.build(s, e, payload)
      case "lapper" => LapperIntervalIndex.build(s, e, payload)
      case "ailist" => AiListIntervalIndex.build(s, e, payload)
      case "coitrees" => CoitreesIntervalIndex.build(s, e, payload)
      case "arrayintervaltree" => ArrayTreeIntervalIndex.build(s, e, payload)
      case "superintervals" | "" => ContigIntervalIndex.build(s, e, payload)
      case other => throw new IllegalArgumentException(
        s"unknown interval-join algorithm '$other' (superintervals | eytzinger | lapper | ailist | coitrees | arrayintervaltree | linear)")
    }
}

/** A per-contig index answering a stabbing query with one Long —
  * the shared contract of [[CountOverlapIndex]] (overlap count) and
  * [[CoverageIndex]] (covered basepairs), letting one codegen probe
  * expression (graft.plans.ScalarIndexProbe) serve both. */
trait ScalarIndex extends Serializable {
  def valueOf(qs: Long, qe: Long): Long
}

/** Two-sorted-arrays overlap counter — the reference's
  * `CountOverlapIndex` (interval_tree.rs:20-50):
  * `count = #(starts <= qe) − #(ends < qs)`, each via binary search.
  * O(log n) per probe, no enumeration. */
final class CountOverlapIndex(
    val sortedStarts: Array[Long],
    val sortedEnds: Array[Long],
    /** sorted positions of point intervals (start == end) — needed to
      * correct inverted strict-adjusted queries, see [[count]] */
    val sortedPointPos: Array[Long]) extends ScalarIndex {

  def valueOf(qs: Long, qe: Long): Long = count(qs, qe)

  def count(qs: Long, qe: Long): Long = {
    val base = (upperBound(sortedStarts, qe) - lowerBound(sortedEnds, qs)).toLong
    if (qs <= qe + 1) base
    else {
      // Inverted strict-adjusted query (point probe): intervals lying
      // entirely inside the open window (qe, qs) — exactly the point
      // intervals at qe+1, since FilterOp inverts by at most 2 — are
      // subtracted via sortedEnds without ever being counted in
      // sortedStarts. Add them back for an exact count.
      base + (upperBound(sortedPointPos, qs - 1) - lowerBound(sortedPointPos, qe + 1)).toLong
    }
  }

  @inline private def upperBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }
  /** first index with arr(i) >= key */
  @inline private def lowerBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }
}

object CountOverlapIndex {
  def build(s: Array[Long], e: Array[Long]): CountOverlapIndex = {
    val ss = s.clone(); val ee = e.clone()
    java.util.Arrays.sort(ss); java.util.Arrays.sort(ee)
    val pts = s.indices.collect { case i if s(i) == e(i) => s(i) }.toArray
    java.util.Arrays.sort(pts)
    new CountOverlapIndex(ss, ee, pts)
  }
}

/** Coverage index: intervals merged (weak/closed convention — reference
  * merges the left table per contig before coverage,
  * interval_tree.rs:104-106) into disjoint sorted runs, plus prefix
  * sums of closed-interval lengths and of point-run counts.
  * `coverage([qs,qe])` reproduces the reference's `get_coverage`
  * formula EXACTLY (interval_tree.rs:145-152): each run overlapping
  * the (strict-adjusted) query closed-style contributes
  * `max(1, min(qe+1, runEnd) - max(qs-1, runStart))` — i.e. the
  * closed length of the run's intersection with the one-expanded
  * query, minus one, clamped to >=1. NOT the closed-inclusive covered
  * length: a probe fully inside a run yields `len+1` (the reference's
  * own fixture expects coverage 202 for a 201-bp fully-covered probe,
  * tests/integration_test.rs:703) and a point run inside the probe
  * yields 1. Validated row-for-row against the reference's shipped
  * polars-bio golden (expected_coverage.parquet, 438,694 rows). */
final class CoverageIndex(
    val ms: Array[Long], // merged starts, ascending, disjoint
    val me: Array[Long], // merged ends
    val prefixLen: Array[Long],
    val prefixPts: Array[Int]) extends ScalarIndex {

  def valueOf(qs: Long, qe: Long): Long = coverage(qs, qe)

  /** F8 subtract kernel: fragments of `[ls, le]` left uncovered by the
    * merged runs, cursor-style boundaries (a fragment ENDS at a run
    * start and RESUMES at a run end — subtract.rs:391-442). Candidate
    * runs are selected with the op's overlap predicate (weak
    * `me >= ls && ms <= le`, strict `me > ls && ms < le`); the rights
    * must be pre-merged with the MATCHING convention
    * ([[CoverageIndex.build]]'s `strictMerge` for strict ops):
    * op-consistent merging yields the same fragment geometry as the
    * reference's advancing-cursor over unmerged rights.
    * Emits nothing when the interval is fully covered; emits
    * `(ls, le)` itself when no run overlaps. */
  def gaps(ls: Long, le: Long, strict: Boolean)(f: (Long, Long) => Unit): Unit = {
    if (ms.length == 0) { f(ls, le); return }
    // run range [first, last] satisfying the op's overlap predicate
    val first = if (strict) upperBound(me, ls) else lowerBound(me, ls)
    val last = (if (strict) lowerBound(ms, le) else upperBound(ms, le)) - 1
    if (first > last) { f(ls, le); return }
    var cursor = ls
    var i = first
    while (i <= last) {
      if (ms(i) > cursor) f(cursor, ms(i))
      if (me(i) > cursor) cursor = me(i)
      i += 1
    }
    if (cursor < le) f(cursor, le)
  }

  def coverage(qs: Long, qe: Long): Long = {
    if (ms.length == 0) return 0L
    // first merged run with end >= qs (me is ascending since runs are disjoint)
    val first = lowerBound(me, qs)
    // last merged run with start <= qe
    val last = upperBound(ms, qe) - 1
    // NB: an inverted strict-adjusted query (point probe, qs = qe + 2)
    // still selects a run strictly spanning the point — same convention
    // as CountOverlapIndex — and at most one run can qualify.
    if (first > last) return 0L
    def contrib(i: Int): Long =
      math.max(1L, math.min(qe + 1, me(i)) - math.max(qs - 1, ms(i)))
    if (first == last) return contrib(first)
    var total = contrib(first) + contrib(last)
    if (last - first > 1) {
      // interior runs lie strictly inside the expanded query, so the
      // min/max clamps cannot bind: contribution = closedLen - 1,
      // floored at 1 — i.e. point runs (closedLen 1) contribute 1
      val lenSum = prefixLen(last) - prefixLen(first + 1)
      val n = (last - 1) - (first + 1) + 1
      val pts = prefixPts(last) - prefixPts(first + 1)
      total += lenSum - n + pts
    }
    total
  }

  @inline private def upperBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) <= key) lo = mid + 1 else hi = mid
    }
    lo
  }
  @inline private def lowerBound(arr: Array[Long], key: Long): Int = {
    var lo = 0; var hi = arr.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr(mid) < key) lo = mid + 1 else hi = mid
    }
    lo
  }
}

object CoverageIndex {
  /** Merge (weak default: `s <= curEnd` joins a run — matching the
    * reference's complement/coverage internal merge,
    * complement.rs:300-317) and build prefix lengths. Closed-interval
    * length = e - s + 1. `strictMerge` keeps TOUCHING runs separate
    * (`s < curEnd` required to join) — the convention strict subtract
    * needs: a touching pair merged weakly would qualify as a strict
    * overlap candidate that neither member is, swallowing point
    * fragments at the shared boundary. */
  def build(s: Array[Long], e: Array[Long], strictMerge: Boolean = false): CoverageIndex = {
    val n = s.length
    if (n == 0) return new CoverageIndex(Array.empty, Array.empty, Array(0L), Array(0))
    val order = Array.range(0, n).sortInPlaceWith { (a, b) =>
      if (s(a) != s(b)) s(a) < s(b) else e(a) < e(b)
    }
    val mss = new ArrayBuffer[Long](); val mes = new ArrayBuffer[Long]()
    var cs = s(order(0)); var ce = e(order(0))
    var i = 1
    while (i < n) {
      val o = order(i)
      val joins = if (strictMerge) s(o) < ce else s(o) <= ce
      if (joins) { if (e(o) > ce) ce = e(o) }
      else { mss += cs; mes += ce; cs = s(o); ce = e(o) }
      i += 1
    }
    mss += cs; mes += ce
    val k = mss.length
    val pref = new Array[Long](k + 1)
    val pts = new Array[Int](k + 1)
    i = 0
    while (i < k) {
      pref(i + 1) = pref(i) + (mes(i) - mss(i) + 1)
      pts(i + 1) = pts(i) + (if (mss(i) == mes(i)) 1 else 0)
      i += 1
    }
    new CoverageIndex(mss.toArray, mes.toArray, pref, pts)
  }
}
