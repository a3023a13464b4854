package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Shared per-CODEPOINT polynomial hashing for the custom expressions.
  *
  * The hot paths in [[PolyHash]]/[[SimHash60]] fold UTF-8 bytes (free
  * on ASCII, where byte == codepoint == the oracle's `ascii()`);
  * non-ASCII strings fall back here so the value stays codepoint-exact
  * for ALL input — matching both the DuckDB oracles and the lambda
  * implementations these expressions replaced.
  */
object HashUtil {
  val P = 1000000007L

  /** fold(acc·31 + codepoint) mod P. */
  def poly31(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** (poly31, poly37) in one pass — SimHash60's token hash halves. */
  def polyPair(s: UTF8String): Array[Long] = {
    val str = s.toString
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 31 + cp) % P
      h2 = (h2 * 37 + cp) % P
      i += Character.charCount(cp)
    }
    Array(h1, h2)
  }
}
