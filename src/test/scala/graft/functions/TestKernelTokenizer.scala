package graft.functions

/** Dotted-path-loadable tokenizer for the registry spec (reference
  * _import_function parity): plain whitespace spans. */
class TestKernelTokenizer extends (Array[Char] => Tokenize.SpanIterator) {
  def apply(cs: Array[Char]): Tokenize.SpanIterator = Tokenize.kernelWhitespace(cs)
}
