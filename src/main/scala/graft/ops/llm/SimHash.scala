package graft.ops.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SimHash (64-bit, emitted as a 64-char bit string): per-token xxhash64,
  * per-bit ±1 votes accumulated in one `aggregate` pass with an
  * array<long> accumulator, sign → bit. Near-identical documents differ in
  * few bit positions (Hamming distance), so near-dup candidates are "same
  * value in any of a few bit-band substrings" — joinable exactly like
  * MinHash bands.
  *
  * xxhash64 has no DuckDB twin, so SimHash queries are rows-only checked by
  * the driver; SimHashSpec covers the semantics (self-distance 0, small
  * perturbation → small Hamming distance, unrelated docs ≈ 32).
  */
object SimHash {

  /** 64-char bit-string SimHash of a whitespace-tokenized text column.
    * `col` must be a plain column name (spliced into a SQL lambda — Scala's
    * column DSL cannot shift by a lambda variable, `getbit` can).
    */
  def simhashBits(colName: String): Column = expr(
    s"""aggregate(
       |  transform(split(lower(trim($colName)), '\\\\s+'), t -> xxhash64(t)),
       |  array_repeat(0L, 64),
       |  (acc, h) -> zip_with(acc, sequence(0, 63),
       |    (v, i) -> v + (getbit(h, i) * 2 - 1)),
       |  acc -> concat_ws('', transform(acc,
       |    v -> CASE WHEN v > 0 THEN '1' ELSE '0' END)))""".stripMargin)

  /** Hamming distance between two equal-length bit strings. */
  def hamming(a: Column, b: Column): Column =
    size(filter(zip_with(split(a, ""), split(b, ""), (x, y) => x =!= y),
      d => d))
}
