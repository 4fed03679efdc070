package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline operators for large-scale training-data curation, all
  * expressed with codegen'd `functions._` columns (no UDFs) so Catalyst
  * can push/prune/fuse them. Word-level tokenization here is the
  * whitespace "WordTokenizer" analog (reference
  * crates/core/src/tokenizer/fields/words.rs); the exact IR tokenizer
  * lives in graft.core.Tokenizers and is used by the index engine.
  */
object TextOps {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => t =!= "")

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that", "be")

  /** Stopword ratio + length stats — the quality-scoring primitive. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val n = size(toks)
    val stop = size(filter(toks, t => t.isin(EnglishStopwords: _*)))
    val distinctN = size(array_distinct(toks))
    Seq(
      "num_tokens" -> n,
      "num_distinct" -> distinctN,
      "stopword_ratio" -> round(stop.cast("double") / n, 4),
      "distinct_ratio" -> round(distinctN.cast("double") / n, 4),
      "mean_token_len" -> round((length(text) - n + 1).cast("double") / n, 4)
    )
  }

  /** Deterministic document fingerprint: md5 over the sorted distinct
    * token set (cross-engine reproducible). */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** n-token shingles via posexplode-free column ops: transform over
    * index range. Docs with fewer than n tokens yield an empty array
    * (sequence(1, count<=0) would produce a descending range whose
    * negative indices crash slice at runtime — guarded explicitly). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    when(count > 0,
      transform(sequence(lit(1), count),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** MinHash band signature j of a single md5 per shingle: the 128-bit
    * md5 hex splits into `bands` disjoint slices, each an independent
    * hash function (lexicographic min of hex = deterministic hash min,
    * identically computable in any engine with md5 + substr). Up to 4
    * bands of 8 hex chars (32 bits) each. */
  def bandSlice(md5Hex: Column, j: Int, bands: Int): Column = {
    require(bands >= 1 && bands <= 4, s"1..4 bands supported, got $bands")
    val width = 32 / bands
    substring(md5Hex, j * width + 1, width)
  }

  /** MinHash signature component j (single-row column form; prefer the
    * explode/agg path in Dedup.minhashCandidates for large corpora —
    * lambda-bearing subtrees are excluded from Spark's common-
    * subexpression elimination, so per-band column recompute costs
    * bands x the shingle work). */
  def minhashBand(text: Column, j: Int, shingleN: Int = 3, bands: Int = 4): Column =
    array_min(transform(shingles(text, shingleN),
      s => bandSlice(md5(s.cast("binary")), j, bands)))
}
