package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / dedup building blocks for the LLM-pipeline surface.
  *
  * Everything is composed from codegen'd built-ins (no UDFs) so the
  * whole pipeline stays inside WholeStageCodegen, and every primitive
  * has a bit-identical DuckDB rendering (the oracle): the shared
  * numeric hash is the first 15 hex chars of md5 (60 bits, positive
  * in an int64 in both engines).
  */
object TextFunctions {

  /** Large prime modulus; keeps all poly-hash / minhash arithmetic
    * below 2^63 in both engines (values < P ≈ 2^30, multipliers small). */
  val P: Long = 1000000007L

  /** 60-bit deterministic content hash: md5 hex prefix as int64.
    * Identical in DuckDB: ('0x' || substr(md5(x),1,15))::BIGINT */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** hash60 reduced mod P (for overflow-safe permutation arithmetic). */
  def hashP(c: Column): Column = hash60(c) % P

  /** Whitespace tokens (literal single-space split — the corpus is
    * single-space normalized; DuckDB: string_split(text, ' ')). */
  def tokens(c: Column): Column = split(c, " ")

  // NOTE: shingle construction deliberately has NO array-lambda helper
  // here. Building shingles as transform(sequence(...), i ->
  // element_at(split(text), ...)) re-evaluates split per lambda
  // element after projection collapse — use the posexplode + lead()
  // window shape instead (LlmQueries.shingleRows), which tokenizes
  // once per document.

  /** MinHash permutation parameters (fixed, shared with the oracle);
    * signature aggregation lives in LlmQueries.minhashSigCore (min
    * over exploded shingle-hash rows — one md5 per shingle). */
  val MinhashA: Seq[Long] = Seq(2, 3, 5, 7, 11, 13, 17, 19)
  val MinhashB: Seq[Long] = Seq(1, 2, 3, 4, 5, 6, 7, 8)

  /** n-bit SimHash over token hashes: majority vote per bit.
    * Bit j of h extracted as (h % 2^(j+1)) >= 2^j — shift-free so the
    * same expression runs in DuckDB. n ≤ 30: hashes are mod P ≈ 2^30,
    * so higher bits carry no signal. */
  def simhashN(tokenHashes: Column, n: Int): Column = {
    require(n > 0 && n <= 30, "simhash width must be in 1..30 (hash is mod P ~ 2^30)")
    val bits = (0 until n).map { j =>
      val lo = 1L << j
      val hi = 1L << (j + 1)
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when((h % hi) >= lo, 1L).otherwise(-1L))
      when(vote > 0, lit(lo)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** 16-bit SimHash (compact signature column). */
  def simhash16(tokenHashes: Column): Column = simhashN(tokenHashes, 16)

  /** Order-sensitive document fingerprint: left fold of token hashes,
    * h' = (h*31 + tokHash) mod P — a rolling content hash.
    * DuckDB: list_reduce([0] || hashes, (h, x) -> (h*31 + x) % P) */
  def fingerprint(tokenHashes: Column): Column =
    aggregate(tokenHashes, lit(0L), (h, x) => (h * 31 + x) % P)

  /** Count of tokens exactly equal to `word`. */
  def tokenCountOf(toks: Column, word: String): Column =
    size(filter(toks, t => t === word))
}
