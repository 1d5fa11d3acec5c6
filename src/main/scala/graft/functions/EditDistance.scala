package graft.functions

/**
 * Unrestricted Damerau–Levenshtein distance (Lowrance–Wagner): insert,
 * delete, substitute, and transpose-with-intervening-edits all count 1.
 * This is the TRUE DL metric ("CA" → "ABC" = 2), matching DuckDB's
 * damerau_levenshtein — not the cheaper OSA variant (which would say 3) —
 * so results are oracle-comparable. Reference J5 analog: the notebook's
 * SIM_FUNC_DICT edit-distance feature.
 */
object EditDistance {

  def damerauLevenshtein(a: String, b: String): Int = {
    if (a == null || a.isEmpty) return if (b == null) 0 else b.length
    if (b == null || b.isEmpty) return a.length
    val la = a.length
    val lb = b.length
    val inf = la + lb
    // d is offset by 1: d(i+1)(j+1) = distance over prefixes a[0,i) b[0,j)
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = inf
    var i = 0
    while (i <= la) { d(i + 1)(0) = inf; d(i + 1)(1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(0)(j + 1) = inf; d(1)(j + 1) = j; j += 1 }
    val last = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      j = 1
      while (j <= lb) {
        val k: Int = { val v = last.get(b.charAt(j - 1)); if (v == null) 0 else v }
        val l = db
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) { db = j; 0 } else 1
        val sub = d(i)(j) + cost
        val ins = d(i + 1)(j) + 1
        val del = d(i)(j + 1) + 1
        val trans = d(k)(l) + (i - k - 1) + 1 + (j - l - 1)
        d(i + 1)(j + 1) = math.min(math.min(sub, ins), math.min(del, trans))
        j += 1
      }
      last.put(a.charAt(i - 1), i)
      i += 1
    }
    d(la + 1)(lb + 1)
  }
}
