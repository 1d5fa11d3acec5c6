package graft.functions

/**
 * Suffix array (prefix-doubling, O(n log n)) + Kasai LCP — the in-partition
 * kernel of the suffix-array substring stage (north-rule addition; no
 * reference counterpart, SURVEY.md §2 footnote).
 */
object SuffixArrays {

  /** Suffix array of s (indices sorted by suffix). */
  def build(s: Array[Int]): Array[Int] = {
    val n = s.length
    if (n == 0) return Array.empty
    var rank = s.clone()
    var sa = Array.range(0, n)
    val tmp = new Array[Int](n)
    var k = 1
    // sort by (rank(i), rank(i+k)) with doubling
    while (k < n) {
      val kk = k
      def pairOf(i: Int): (Int, Int) = (rank(i), if (i + kk < n) rank(i + kk) else -1)
      sa = sa.sortBy(pairOf)
      tmp(sa(0)) = 0
      var i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (pairOf(sa(i)) == pairOf(sa(i - 1))) 0 else 1)
        i += 1
      }
      System.arraycopy(tmp, 0, rank, 0, n)
      if (rank(sa(n - 1)) == n - 1) return sa
      k <<= 1
    }
    sa
  }

  /** Kasai LCP array: lcp(i) = LCP(sa(i-1), sa(i)), lcp(0) = 0. */
  def lcp(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val out = new Array[Int](n)
    if (n == 0) return out
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) > 0) {
        val j = sa(rank(i) - 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        out(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    out
  }

  final case class SpanPair(id1: Long, id2: Long, spanLen: Int)

  /**
   * Duplicate spans across documents: concatenate docs with per-doc unique
   * sentinels (negative ints, impossible in text), build SA + LCP, and scan
   * for maximal runs of SA-adjacent suffixes with LCP >= minLen. Every pair
   * of distinct docs inside a run shares an exact substring of at least the
   * run's minimum LCP. Emits each doc pair once with the longest such span.
   */
  def dupSpans(docs: Seq[(Long, String)], minLen: Int,
      maxPairsPerGroup: Int = 100000): Seq[SpanPair] = {
    if (docs.size < 2) return Nil
    val totalLen = docs.map(_._2.length).sum + docs.size
    val s = new Array[Int](totalLen)
    val docOf = new Array[Int](totalLen)
    var pos = 0
    var d = 0
    docs.foreach { case (_, text) =>
      var i = 0
      while (i < text.length) {
        s(pos) = text.charAt(i).toInt + 1 // shift: keep > 0
        docOf(pos) = d
        pos += 1; i += 1
      }
      s(pos) = -(d + 1) // unique sentinel per doc
      docOf(pos) = d
      pos += 1; d += 1
    }
    val sa = build(s)
    val lcps = lcp(s, sa)
    val ids = docs.map(_._1).toArray
    val best = scala.collection.mutable.HashMap.empty[(Long, Long), Int]
    var i = 1
    while (i < sa.length) {
      if (lcps(i) >= minLen) {
        // run of suffixes sharing >= minLen prefix: [runStart-1 .. runEnd]
        val runStart = i
        var runMin = lcps(i)
        val members = scala.collection.mutable.LinkedHashSet(docOf(sa(i - 1)))
        while (i < sa.length && lcps(i) >= minLen) {
          runMin = math.min(runMin, lcps(i))
          members += docOf(sa(i))
          i += 1
        }
        if (members.size > 1 && best.size < maxPairsPerGroup) {
          val ms = members.toArray
          var a = 0
          while (a < ms.length) {
            var b = a + 1
            while (b < ms.length) {
              val k =
                if (ids(ms(a)) < ids(ms(b))) (ids(ms(a)), ids(ms(b)))
                else (ids(ms(b)), ids(ms(a)))
              if (k._1 != k._2) {
                val cur = best.getOrElse(k, 0)
                if (runMin > cur) best(k) = runMin
              }
              b += 1
            }
            a += 1
          }
        }
        val _ = runStart // run bounds kept for future span-offset emission
      } else i += 1
    }
    best.iterator.map { case ((a, b), l) => SpanPair(a, b, l) }.toSeq
      .sortBy(p => (p.id1, p.id2))
  }
}
