package graft.core

/** Signal framework: the initial ranking score is a LINEAR MODEL
  * score(doc) = Σ over signals of coefficient(signal) · signalScore(doc)
  * (reference ranking/initial.rs:79-93 summing
  * coefficient(signal) * calc.score over SignalComputer outputs;
  * signal registry ranking/signals/mod.rs:108-155).
  *
  * The reference's 37-core-signal web set maps onto the code corpus:
  *
  * | here             | reference signal        | default coeff (theirs) |
  * |------------------|-------------------------|------------------------|
  * | bm25_f           | Bm25F                   | 0.1                    |
  * | bm25_content     | Bm25CleanBody           | 0.005                  |
  * | content_coverage | CleanBodyCoverage       | 0.01                   |
  * | bm25_bigrams     | Bm25CleanBodyBigrams    | 0.005                  |
  * | bm25_stemmed     | Bm25StemmedCleanBody    | 0.001                  |
  * | idf_sum_url      | IdfSumUrl (path tokens) | 0.0006                 |
  * | idf_sum_repo     | IdfSumSiteNoTokenizer   | 0.00015                |
  * | centrality       | HostCentrality          | 2.0                    |
  * | centrality_rank  | HostCentralityRank      | 0.02                   |
  * | url_slashes      | UrlSlashes              | 0.1                    |
  * | url_digits       | UrlDigits               | 0.01                   |
  *
  * Transforms carry the reference formulas (signals/core/non_text.rs):
  * rank score = max(0, 10 - log8(1 + rank)) (:50-59), digit/slash
  * scores = 1/(x+1) (:66-74). Centrality here is the deterministic
  * sortKey pseudo-centrality in [0,1); its per-segment rank is the doc
  * id itself (doc ids are assigned in descending static-score order —
  * the index-wide invariant). */
object Signals {
  final val Bm25F = "bm25_f"
  final val Bm25Content = "bm25_content"
  final val ContentCoverage = "content_coverage"
  final val Bm25Bigrams = "bm25_bigrams"
  final val Bm25Stemmed = "bm25_stemmed"
  final val IdfSumUrl = "idf_sum_url"
  final val IdfSumRepo = "idf_sum_repo"
  final val Centrality = "centrality"
  final val CentralityRank = "centrality_rank"
  final val UrlSlashes = "url_slashes"
  final val UrlDigits = "url_digits"

  val All: Seq[String] = Seq(Bm25F, Bm25Content, ContentCoverage, Bm25Bigrams,
    Bm25Stemmed, IdfSumUrl, IdfSumRepo, Centrality, CentralityRank,
    UrlSlashes, UrlDigits)

  val DefaultCoefficients: Map[String, Double] = Map(
    Bm25F -> 0.1, Bm25Content -> 0.005, ContentCoverage -> 0.01,
    Bm25Bigrams -> 0.005, Bm25Stemmed -> 0.001,
    IdfSumUrl -> 0.0006, IdfSumRepo -> 0.00015,
    Centrality -> 2.0, CentralityRank -> 0.02,
    UrlSlashes -> 0.1, UrlDigits -> 0.01)

  /** non_text.rs:50-59. */
  def scoreRank(rank: Double): Double =
    math.max(0.0, 10.0 - math.log(1.0 + rank) / math.log(8.0))

  /** non_text.rs:66-74. */
  def scoreCount(x: Double): Double = 1.0 / (x + 1.0)

  /** sortKey hash -> deterministic pseudo-centrality in [0,1). */
  def centralityOf(sortKey: Long): Double =
    (sortKey >>> 11).toDouble / (1L << 53).toDouble

  def linear(values: Map[String, Double], coeffs: Map[String, Double]): Double =
    values.iterator.map { case (k, v) => coeffs.getOrElse(k, 0.0) * v }.sum
}
