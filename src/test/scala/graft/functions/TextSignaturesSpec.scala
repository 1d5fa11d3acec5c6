package graft.functions

import graft.config.GraftConfig
import org.scalatest.funsuite.AnyFunSuite

class TextSignaturesSpec extends AnyFunSuite {
  val cfg = GraftConfig.default

  test("normalize lowercases, collapses whitespace, trims") {
    assert(new String(TextSignatures.normalize("  Hello\t\n WORLD  ")) == "hello world")
    assert(new String(TextSignatures.normalize("")) == "")
    assert(new String(TextSignatures.normalize("   ")) == "")
  }

  test("shingleSet is sorted, distinct, and edit-sensitive") {
    val a = TextSignatures.shingleSet("abcdefgh".toCharArray, 5)
    assert(a.length == 4) // abcde bcdef cdefg defgh
    assert(a.sameElements(a.sorted.distinct))
    val b = TextSignatures.shingleSet("abcdefgh".toCharArray, 5)
    assert(a.sameElements(b), "deterministic")
  }

  test("too-short / empty text yields empty signatures (P13 semantics)") {
    assert(TextSignatures.compute("", cfg).shingles.isEmpty)
    assert(TextSignatures.compute("abc", cfg).shingles.isEmpty)
    assert(TextSignatures.compute(null, cfg).shingles.isEmpty)
  }

  test("identical text => identical signatures; band keys collide fully") {
    val s1 = TextSignatures.compute("the quick brown fox jumps over the lazy dog", cfg)
    val s2 = TextSignatures.compute("The  quick Brown fox jumps over the lazy dog", cfg)
    // normalization makes these identical
    assert(s1.minhash.sameElements(s2.minhash))
    assert(s1.bandKeys.sameElements(s2.bandKeys))
    assert(s1.simhash == s2.simhash)
  }

  test("minhash agreement approximates exact jaccard (statistical)") {
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val edited = (1 to 200).map(i => if (i % 5 == 0) s"zzz$i" else s"tok$i").mkString(" ")
    val a = TextSignatures.compute(base, cfg)
    val b = TextSignatures.compute(edited, cfg)
    val exact = Hashing.jaccardSorted(a.shingles, b.shingles)
    val est = a.minhash.zip(b.minhash).count { case (x, y) => x == y }.toDouble / cfg.numPerm
    // sigma = sqrt(j(1-j)/128) <= 0.045; allow 4 sigma
    assert(math.abs(exact - est) < 0.18, s"exact=$exact est=$est")
  }

  test("simhash hamming distance small for near-dup token sets") {
    val base = (1 to 300).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 300).map(i => if (i == 7) "changed" else s"word$i").mkString(" ")
    val far = (1 to 300).map(i => s"other$i").mkString(" ")
    val a = TextSignatures.compute(base, cfg).simhash
    val b = TextSignatures.compute(nearDup, cfg).simhash
    val c = TextSignatures.compute(far, cfg).simhash
    assert(java.lang.Long.bitCount(a ^ b) <= 3)
    assert(java.lang.Long.bitCount(a ^ c) > 10)
  }

  test("winnowing: exact shared substring >= minSpanLen shares a fingerprint") {
    val shared = "x" * 10 + "this is an exact shared span of sufficient length!" + "y" * 10
    val cs1 = TextSignatures.normalize("aaa prefix one " + shared + " suffix one bbb")
    val cs2 = TextSignatures.normalize("ccc completely different lead " + shared + " tail ddd")
    val f1 = TextSignatures.winnow(cs1, cfg.spanGramLen, cfg.winnowWindow).toSet
    val f2 = TextSignatures.winnow(cs2, cfg.spanGramLen, cfg.winnowWindow).toSet
    assert(shared.length >= cfg.minSpanLen)
    assert(f1.intersect(f2).nonEmpty)
  }

  test("jaccardSorted: empty vs empty is 0 (empty must not match empty)") {
    assert(Hashing.jaccardSorted(Array.empty, Array.empty) == 0.0)
    assert(Hashing.jaccardSorted(Array(1L, 2L), Array(1L, 2L)) == 1.0)
    assert(Hashing.jaccardSorted(Array(1L, 2L), Array(2L, 3L)) == 1.0 / 3.0)
  }

  test("mulMod61 matches BigInt arithmetic") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 1000) {
      val a = rnd.nextLong().abs % Hashing.MersennePrime
      val b = rnd.nextLong().abs % Hashing.MersennePrime
      val expected = (BigInt(a) * BigInt(b) % BigInt(Hashing.MersennePrime)).toLong
      assert(Hashing.mulMod61(a, b) == expected, s"a=$a b=$b")
    }
  }

  test("kernel tokenizers: whitespace spans == historical split; alnum splits punctuation") {
    def toks(name: String, s: String): Seq[String] = {
      val cs = TextSignatures.normalize(s)
      val it = Tokenize.kernel(name)(cs)
      val out = Seq.newBuilder[String]
      while (it.hasNext) {
        val sp = it.nextSpan()
        val a = Tokenize.spanStart(sp); val b = Tokenize.spanEnd(sp)
        out += new String(cs, a, b - a)
      }
      out.result()
    }
    assert(toks("whitespace", "  Hello   WORLD x ") == Seq("hello", "world", "x"))
    assert(toks("whitespace", "") == Seq.empty)
    assert(toks("alnum", "foo-bar v2.1!") == Seq("foo", "-", "bar", "v2", ".", "1", "!"))
    intercept[IllegalArgumentException](Tokenize.kernel("neural"))
  }

  test("tokenizer choice changes simhash tokens but whitespace default is unchanged") {
    val cfg = GraftConfig.default
    val text = "alpha-beta gamma, delta!"
    val ws = TextSignatures.compute(text, cfg)
    val al = TextSignatures.compute(text, cfg.copy(tokenizer = "alnum"))
    assert(ws.nTokens == 3) // "alpha-beta", "gamma,", "delta!"
    assert(al.nTokens == 7) // alpha,-,beta,gamma,",",delta,!
    // shingle/minhash signatures are tokenizer-independent
    assert(ws.minhash.toSeq == al.minhash.toSeq)
    assert(ws.shingles.toSeq == al.shingles.toSeq)
    assert(ws.simhash != al.simhash)
  }

  test("tokenizer registry is OPEN: registered kernels + dotted-path classes work") {
    // register a custom kernel under a short name (the reference's
    // pluggable-tokenizer extension point, field_config_parser.py:23-26)
    Tokenize.registerKernel("everychar", cs => new Tokenize.SpanIterator {
      private var i = 0
      def hasNext: Boolean = i < cs.length
      def nextSpan(): Long = { val s = (i.toLong << 32) | (i + 1); i += 1; s }
    })
    val cs = TextSignatures.normalize("ab c")
    val it = Tokenize.kernel("everychar")(cs)
    var n = 0
    while (it.hasNext) { it.nextSpan(); n += 1 }
    assert(n == 4) // "ab c" -> 4 chars incl the space
    // a registered kernel is usable straight from the config
    val sig = TextSignatures.compute("hello world of tokens",
      graft.config.GraftConfig.default.copy(tokenizer = "everychar"))
    assert(sig.nTokens == "hello world of tokens".length)
    // unknown names list what IS available
    val err = intercept[IllegalArgumentException](Tokenize.kernel("neural2"))
    assert(err.getMessage.contains("everychar") && err.getMessage.contains("whitespace"))
    // dotted path loads a class reflectively (reference _import_function parity)
    val viaClass = Tokenize.kernel("graft.functions.TestKernelTokenizer")(cs)
    var m = 0
    while (viaClass.hasNext) { viaClass.nextSpan(); m += 1 }
    assert(m == 2) // whitespace spans: "ab", "c"
    intercept[IllegalArgumentException](Tokenize.kernel("no.such.Class"))
  }
}
