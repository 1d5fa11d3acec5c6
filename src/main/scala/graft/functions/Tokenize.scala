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
}
