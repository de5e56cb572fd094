package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization / tokenization / n-gram column functions.
  *
  * Semantics locked in SURVEY.md §7 (S1–S3), derived from the reference
  * n-gram counter (reference/WordCount.java:76-97):
  *   - S1 normalize: strip everything but [a-zA-Z0-9\s], lowercase.
  *   - tokenize: split on whitespace runs, dropping empty tokens
  *     (java.util.StringTokenizer semantics).
  *   - S2 n-gram scope: sliding windows of n tokens *within one document*,
  *     single-space joined; a document with fewer than n tokens yields
  *     nothing (reference/WordCount.java:86 emits only once the queue
  *     holds n-1 prior tokens).
  *
  * [[ngrams]] and [[tokens]] evaluate via the native single-pass Catalyst
  * expression [[NGramsExpr]]; the pure-`functions` composition is kept as
  * [[ngramsHof]]/[[tokensHof]] and property-tested equivalent
  * (NgramSpec), per the ship-fallback-first plan of SURVEY.md §4.3.
  */
object TextFns {

  /** S1: `lower(regexp_replace(s, "[^a-zA-Z0-9\s]+", ""))`
    * (reference/WordCount.java:76). */
  def normalize(c: Column): Column =
    lower(regexp_replace(c, "[^a-zA-Z0-9\\s]+", ""))

  /** Whitespace tokens of the *raw* string, empties dropped. */
  def rawTokens(c: Column): Column = {
    val parts = split(c, "\\s+")
    filter(parts, t => length(t) > lit(0))
  }

  /** Normalized tokens — native [[NGramsExpr]] n=1 fast path
    * (reference/WordCount.java:81-84). */
  def tokens(c: Column): Column = NGramsEval(c, 1)

  /** HOF form of [[tokens]]: S1 then whitespace split, empties dropped
    * (StringTokenizer never emits empty tokens; Spark `split` can emit a
    * leading "" — the filter restores parity). */
  def tokensHof(c: Column): Column = rawTokens(normalize(c))

  /** Sliding n-gram windows over a token array, single-space joined.
    * <n tokens → empty array. n=1 → the tokens themselves. */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram length must be >= 1, got $n")
    if (n == 1) toks
    else
      when(size(toks) >= n,
        transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
  }

  /** End-to-end: normalize → tokenize → n-gram windows (flagship G2),
    * evaluated by the native single-pass [[NGramsExpr]]. */
  def ngrams(c: Column, n: Int): Column = NGramsEval(c, n)

  /** HOF fallback form of [[ngrams]] (SURVEY.md §4.3 item 1 fallback). */
  def ngramsHof(c: Column, n: Int): Column = ngramsOfTokens(tokensHof(c), n)
}
