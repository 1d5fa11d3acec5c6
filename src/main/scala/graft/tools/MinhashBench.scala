package graft.tools

import graft.functions.Hashing._

/** TEMPORARY microbench (round 5): the pairs slice is dominated by the
  * 128-perm MinHash inner loop (~137 core-s of ~470 at 80k pages). Compare:
  *   base     — current shape: shingle-outer, dedup+perm fused, mod-61
  *   inverted — distinct shingle array first, then perm-outer (identical
  *              output values)
  *   wrap     — perm-outer with wraparound multiply-add family + unsigned
  *              min (DIFFERENT signature values; needs recall re-validation)
  * Usage: runMain graft.tools.MinhashBench [nDocs] [charsPerDoc]
  */
object MinhashBench {
  val NumPerm = 128

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 4000
    val chars = if (args.length > 1) args(1).toInt else 2500
    val k = 5
    // synthetic corpus: deterministic pseudo-text (lowercase + spaces)
    val docs = Array.tabulate(nDocs) { d =>
      val sb = new java.lang.StringBuilder(chars)
      var s = mix64(d.toLong + 99)
      var i = 0
      while (i < chars) {
        s = mix64(s)
        val c = (s & 0x7fffffffL) % 27
        sb.append(if (c == 26) ' ' else ('a' + c).toChar)
        i += 1
      }
      sb.toString.toCharArray
    }
    val a = stream(101, NumPerm).map(x => (x & MersennePrime) | 1L)
    val b = stream(202, NumPerm).map(_ & MersennePrime)
    val aw = stream(101, NumPerm).map(_ | 1L)
    val bw = stream(202, NumPerm)

    def shingleHashes(cs: Array[Char]): Array[Long] = {
      val set = new java.util.HashSet[java.lang.Long]()
      val out = new Array[Long](cs.length)
      var n = 0
      var i = 0
      while (i <= cs.length - k) {
        val h = hashChars(cs, i, i + k)
        if (set.add(h)) { out(n) = h; n += 1 }
        i += 1
      }
      java.util.Arrays.copyOf(out, n)
    }
    val hashed = docs.map(shingleHashes)

    def base(): Long = {
      var acc = 0L
      hashed.foreach { hs =>
        val sig = new Array[Long](NumPerm)
        java.util.Arrays.fill(sig, Long.MaxValue)
        var i = 0
        while (i < hs.length) {
          val x = hs(i) & MersennePrime
          var p = 0
          while (p < NumPerm) {
            val v = addMod61(mulMod61(a(p), x), b(p))
            if (v < sig(p)) sig(p) = v
            p += 1
          }
          i += 1
        }
        acc ^= sig(0) + sig(NumPerm - 1)
      }
      acc
    }

    def inverted(): Long = {
      var acc = 0L
      hashed.foreach { hs =>
        val sig = new Array[Long](NumPerm)
        var p = 0
        while (p < NumPerm) {
          val ap = a(p); val bp = b(p)
          var m = Long.MaxValue
          var i = 0
          while (i < hs.length) {
            val v = addMod61(mulMod61(ap, hs(i) & MersennePrime), bp)
            if (v < m) m = v
            i += 1
          }
          sig(p) = m
          p += 1
        }
        acc ^= sig(0) + sig(NumPerm - 1)
      }
      acc
    }

    def wrap(): Long = {
      var acc = 0L
      hashed.foreach { hs =>
        val sig = new Array[Long](NumPerm)
        var p = 0
        while (p < NumPerm) {
          val ap = aw(p); val bp = bw(p)
          // unsigned min via sign-flip: min over (v ^ MinValue) signed
          var m = Long.MaxValue
          var i = 0
          while (i < hs.length) {
            val v = (ap * hs(i) + bp) ^ Long.MinValue
            if (v < m) m = v
            i += 1
          }
          sig(p) = m ^ Long.MinValue
          p += 1
        }
        acc ^= sig(0) + sig(NumPerm - 1)
      }
      acc
    }

    // wrap arithmetic in the CURRENT kernel's fused shingle-outer shape
    // (dedup branch around the perm loop, sig read-modify-write per iter)
    def wrapFused(): Long = {
      var acc = 0L
      hashed.foreach { hs =>
        val sig = new Array[Long](NumPerm)
        java.util.Arrays.fill(sig, Long.MaxValue)
        var i = 0
        while (i < hs.length) {
          val h = hs(i)
          var p = 0
          while (p < NumPerm) {
            val v = (aw(p) * h + bw(p)) ^ Long.MinValue
            if (v < sig(p)) sig(p) = v
            p += 1
          }
          i += 1
        }
        var p = 0
        while (p < NumPerm) { sig(p) ^= Long.MinValue; p += 1 }
        acc ^= sig(0) + sig(NumPerm - 1)
      }
      acc
    }

    val totalShingles = hashed.map(_.length.toLong).sum
    println(s"[mh] docs=$nDocs shingles=$totalShingles")
    for (round <- 1 to 3) {
      for ((name, f) <- Seq(("base", base _), ("inverted", inverted _),
        ("wrap", wrap _), ("wrapFused", wrapFused _))) {
        val t0 = System.nanoTime()
        val acc = f()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[mh] r$round $name%-9s $s%7.3f s  (${totalShingles * NumPerm / s / 1e6}%8.1f Mops)  acc=$acc")
      }
    }
  }
}
