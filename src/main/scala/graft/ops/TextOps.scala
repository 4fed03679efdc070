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
    * index range, null-trimmed. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = greatest(size(toks) - (n - 1), lit(0))
    transform(sequence(lit(0), count - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))
  }

  /** MinHash signature component j: min over shingles of
    * md5(j:shingle) (lexicographic min of hex = deterministic hash min,
    * identically computable in any engine with md5). */
  def minhashBand(text: Column, j: Int, shingleN: Int = 3): Column =
    array_min(transform(shingles(text, shingleN),
      s => md5(concat(lit(s"$j:"), s).cast("binary"))))
}
