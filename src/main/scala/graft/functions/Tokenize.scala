package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Tokenizers (reference P2: entity_embed/numericalizer.py:73-77
 * `default_tokenizer`, regex `[\w--_]+|[^[\w--_]\s]+` — i.e. runs of word
 * chars EXCLUDING underscore, or runs of punctuation INCLUDING underscore).
 *
 * Java regex lacks Python's character-class subtraction, so the equivalent
 * classes are spelled out: \w minus _ == [\p{L}\p{Nd}] (unicode letters +
 * decimal digits); its complement-minus-whitespace keeps _ as punctuation.
 *
 * The tokenizer is the reference's pluggable extension point
 * (field_config_parser.py:23-26 dotted-path import) — mirrored here as any
 * `Column => Column` injected into the signature/profile operators.
 */
object Tokenize {

  val defaultPattern = "[\\p{L}\\p{Nd}]+|[^\\p{L}\\p{Nd}\\s]+"

  /** Reference-equivalent default tokenizer (lowercases like the configs do). */
  def default(text: Column): Column =
    regexp_extract_all(lower(text), lit(defaultPattern), lit(0))

  /** Plain whitespace tokenizer. */
  def whitespace(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  // ---- kernel-level tokenizers (the signature kernel's injection point,
  //      mirroring the reference's pluggable tokenizer
  //      field_config_parser.py:23-26) ----

  /** Token spans [start, end) over a NORMALIZED char array (lowercase,
    * single-space separated — TextSignatures.normalize output). Must be
    * allocation-light: this runs once per document inside the hottest
    * projection in the engine. */
  type KernelTokenizer = Array[Char] => Iterator[(Int, Int)]

  /** Split on the single spaces normalize produced (the default — identical
    * to the historical inline loop, so existing signatures are unchanged). */
  val kernelWhitespace: KernelTokenizer = cs => new Iterator[(Int, Int)] {
    private var start = 0
    private var nextSpan: (Int, Int) = advance()
    private def advance(): (Int, Int) = {
      while (start < cs.length && cs(start) == ' ') start += 1
      if (start >= cs.length) null
      else {
        var end = start
        while (end < cs.length && cs(end) != ' ') end += 1
        val s = (start, end); start = end + 1; s
      }
    }
    def hasNext: Boolean = nextSpan != null
    def next(): (Int, Int) = { val s = nextSpan; nextSpan = advance(); s }
  }

  /** Reference default_tokenizer semantics (numericalizer.py:73-77): runs
    * of unicode letters/digits, or runs of other non-space chars. */
  val kernelAlnum: KernelTokenizer = cs => new Iterator[(Int, Int)] {
    private var start = 0
    private def isWord(c: Char) = Character.isLetterOrDigit(c)
    private var nextSpan: (Int, Int) = advance()
    private def advance(): (Int, Int) = {
      while (start < cs.length && cs(start) == ' ') start += 1
      if (start >= cs.length) null
      else {
        val word = isWord(cs(start))
        var end = start
        while (end < cs.length && cs(end) != ' ' && isWord(cs(end)) == word) end += 1
        val s = (start, end); start = end; s
      }
    }
    def hasNext: Boolean = nextSpan != null
    def next(): (Int, Int) = { val s = nextSpan; nextSpan = advance(); s }
  }

  /** Registry keyed by GraftConfig.tokenizer (the config-level analog of
    * the reference's dotted-path tokenizer import). */
  def kernel(name: String): KernelTokenizer = name match {
    case "whitespace" => kernelWhitespace
    case "alnum" => kernelAlnum
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' (available: whitespace, alnum)")
  }
}
