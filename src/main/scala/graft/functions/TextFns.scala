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
  * Everything here is pure `org.apache.spark.sql.functions` composition —
  * codegen'd by Catalyst, no UDF/serialization cost, safe at any scale.
  * A native Catalyst expression variant lives in
  * [[graft.functions.NGramsExpr]] and is benchmarked against this form.
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

  /** Normalized tokens: S1 then whitespace split, empties dropped
    * (StringTokenizer never emits empty tokens; Spark `split` can emit a
    * leading "" — the filter restores parity). */
  def tokens(c: Column): Column = rawTokens(normalize(c))

  /** Sliding n-gram windows over a token array, single-space joined.
    * <n tokens → empty array. n=1 → the tokens themselves (the
    * reference's fast path, reference/WordCount.java:81-84). */
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

  /** End-to-end: normalize → tokenize → n-gram windows (flagship G2). */
  def ngrams(c: Column, n: Int): Column = ngramsOfTokens(tokens(c), n)
}
