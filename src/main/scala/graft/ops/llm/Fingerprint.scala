package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document fingerprinting: whole-document digests and rolling-window
  * (winnowing-style) fingerprints. sha256-based so the DuckDB oracle
  * reproduces them bit-for-bit.
  */
object Fingerprint {

  /** 16-hex-char fingerprint of the whole normalized text. */
  def sha16(c: Column): Column =
    substring(sha2(TextOps.normalized(c), 256), 1, 16)

  /** Winnowing-style fingerprint: minimum digest over all `w`-char sliding
    * windows of the normalized text (texts shorter than `w` hash whole).
    * Two documents sharing any `w`-char span have a chance of agreeing;
    * equal texts always agree. O(len) windows per doc, no shuffle.
    * Single-pass codegen expression (functions.RollingMinSha); the
    * composed HOF form is kept below for the parity spec.
    */
  def rollingMin(c: Column, w: Int = 16): Column =
    graft.functions.RollingMinSha(c, w)

  /** Reference HOF formulation of `rollingMin` (slower; used to assert
    * bit-parity in NativeExpressionsSpec).
    */
  def rollingMinHof(c: Column, w: Int = 16): Column = {
    val norm = TextOps.normalized(c)
    array_min(transform(
      sequence(lit(1), greatest(length(norm) - (w - 1), lit(1))),
      i => sha2(norm.substr(i, lit(w)), 256)))
  }
}
