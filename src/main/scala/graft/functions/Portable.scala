package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-portable primitives shared by the text/dedup/similarity
  * operators. Everything here must be computable identically in DuckDB SQL
  * (for the oracle gate), so hashing goes through md5 — not Spark's
  * Murmur3 `hash()` or xxhash, which no other engine reproduces.
  */
object Portable {

  /** Portable unsigned 32-bit hash: first 8 hex chars of md5. Both engines:
    * Spark `conv(substring(md5(s),1,8),16,10)`, DuckDB
    * `cast('0x'||substring(md5(s),1,8) as bigint)`. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Second independent 32 bits of the same md5 (hex chars 9–16). */
  def h32b(c: Column): Column =
    conv(substring(md5(c), 9, 8), 16, 10).cast("long")

  /** Whitespace tokens of lower-cased text. */
  def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Word 3-gram shingles; documents shorter than 3 tokens degrade to a
    * single whole-text shingle (mirrors the DuckDB oracle's guard).
    * Native expression — the HOF formulation is interpreted and ~10×
    * slower (see WordShingles). */
  def shingles3(toks: Column): Column =
    expressions.WordShingles(toks)

  /** Word n-gram shingles at arbitrary width (native [[expressions
    * .WordNgrams]]; docs shorter than n degrade to one whole-text
    * shingle, so filter upstream when that matters). */
  def shinglesN(toks: Column, n: Int): Column =
    expressions.WordNgrams(toks, n)

  /** Rolling polynomial fingerprint over the token stream:
    * fold h = (h*131 + h32(token)) mod 1e9+7 — order-sensitive, so equal
    * fingerprints mean equal token sequences (with hash-collision caveat).
    * Left fold matches DuckDB's `list_reduce` exactly. Native expression;
    * the HOF formulation below is kept as the cross-check for the spec. */
  def rollingFingerprint(toks: Column): Column =
    expressions.RollingFingerprint(toks)

  /** Interpreted HOF formulation of [[rollingFingerprint]] — value-
    * identical (CustomExpressionsSpec asserts it), ~20× slower under
    * memory pressure; exists only as the independent reference. */
  def rollingFingerprintHof(toks: Column): Column =
    aggregate(
      transform(toks, t => h32(t)),
      lit(0L),
      (acc, h) => pmod(acc * 131 + h, lit(1000000007L)))
}
