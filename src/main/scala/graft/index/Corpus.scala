package graft.index

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus in the north-rule input
  * shape (repo, path, commit, lang, content). Seeded per doc index, so
  * the table is byte-identical at any parallelism and any partitioning —
  * the property the scaling-efficiency protocol needs (FIXTURES.md §1).
  * No external data, no wall clock.
  */
object Corpus {
  private val Langs = Array("scala", "rust", "py", "java", "md")
  private val Exts = Map("scala" -> "scala", "rust" -> "rs", "py" -> "py",
    "java" -> "java", "md" -> "md")
  private val Dirs = Array("core", "util", "query", "index", "store",
    "net", "api", "model", "exec", "plan", "codec", "test")

  private val BaseWords = Array(
    "the", "license", "apache", "spark", "session", "query", "index", "data",
    "term", "block", "score", "search", "engine", "table", "column", "row",
    "value", "string", "array", "byte", "read", "write", "merge", "sort",
    "hash", "join", "group", "filter", "map", "reduce", "count", "sum",
    "import", "class", "object", "def", "val", "var", "match", "case",
    "return", "public", "static", "void", "self", "none", "true", "false",
    "error", "result", "option", "buffer", "stream", "file", "path", "node",
    "tree", "list", "set", "key", "field", "doc", "text", "token", "parse",
    "build", "test", "assert", "check", "run", "main", "util", "core",
    "great", "website", "example", "runner", "config", "state", "cache",
    "batch", "shuffle", "partition", "segment", "posting", "wand", "bm25")

  /** 512-word vocabulary: base words + synthetic fillers. */
  val Vocab: Array[String] =
    BaseWords ++ (BaseWords.length until 512).map(i => f"tok$i%03d")

  /** Zipf(1.1) cumulative weights over the vocabulary. */
  private lazy val zipfCum: Array[Double] = {
    val w = Array.tabulate(Vocab.length)(i => 1.0 / math.pow(i + 1.0, 1.1))
    val c = new Array[Double](w.length)
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i); c(i) = acc; i += 1 }
    var j = 0
    while (j < c.length) { c(j) /= acc; j += 1 }
    c
  }

  /** SplitMix64 — deterministic per-doc stream. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def sha256Hex(s: String): String = IndexBuilder.sha256Hex(s)

  def mkDoc(i: Long, seed: Long, skew: Boolean): SourceDoc = {
    var state = mix(seed ^ (i * 0x9e3779b97f4a7c15L))
    @inline def nextLong(): Long = { state = mix(state); state }
    @inline def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16

    val repo = f"org${i / 7 % 1000}%03d/repo${i % 97}%03d"
    val lang = Langs((i % Langs.length).toInt)
    val dir = Dirs((nextLong() & 0x7fffffff).toInt % Dirs.length)
    val path = f"src/$dir/file_${i % 10000}%04d.${Exts(lang)}"
    val commit = sha256Hex(s"$repo/$path").substring(0, 40)

    // length: power-law spread 10..5000 so the u8 fieldnorm buckets are
    // exercised across the log-scale knees (FIXTURES.md §1)
    val u = nextDouble()
    val len = 10 + (4990 * u * u * u).toInt

    val sb = new java.lang.StringBuilder(len * 6)
    var t = 0
    while (t < len) {
      val r = nextDouble()
      val idx = {
        val p = java.util.Arrays.binarySearch(zipfCum, r)
        if (p >= 0) p else -p - 1
      }
      sb.append(Vocab(math.min(idx, Vocab.length - 1)))
      sb.append(' ')
      t += 1
    }
    // per-doc salt words (unique tails for the term dictionary; pure
    // alphanumeric so the default tokenizer keeps them whole)
    sb.append(s"zzsalt${i}a zzsalt${i}b")
    if (skew && nextDouble() < 0.95) sb.append(" license license license")
    SourceDoc(repo, path, commit, lang, sb.toString)
  }

  /** Distributed deterministic generation. */
  def generate(spark: SparkSession, numDocs: Long, seed: Long = 42L,
               skew: Boolean = false, partitions: Int = 0): Dataset[SourceDoc] = {
    import spark.implicits._
    val p = if (partitions > 0) partitions
            else spark.sparkContext.defaultParallelism * 2
    spark.range(0, numDocs, 1, p).map(i => mkDoc(i, seed, skew))
  }
}
