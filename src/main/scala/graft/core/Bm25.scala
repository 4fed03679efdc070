package graft.core

/** BM25 scoring, float32 throughout so scores are rank-identical with the
  * reference engine's math.
  *
  * Semantics from /root/reference:
  *  - idf = ln(1 + (N - df + 0.5)/(df + 0.5))
  *    (crates/tantivy/src/query/bm25.rs:52-56)
  *  - weight = idf * (1 + K1); score = weight * tf/(tf + norm(fieldnormId))
  *    with norm cached per fieldnorm id:
  *    norm = K1 * (1 - B + B * fieldnorm / avgFieldnorm)
  *    (crates/tantivy/src/query/bm25.rs:58-69,180-196)
  *  - K1 = 1.2, B = 0.75 (bm25.rs:8-9)
  *  - global max score bound = score(255, 2_013_265_944) (bm25.rs:187-189)
  *
  * Golden constants 0.22920431 / 0.15136132 (fieldnorm/mod.rs:100-155)
  * are asserted in Bm25Spec.
  */
object Bm25 {
  final val K1: Float = 1.2f
  final val B: Float = 0.75f
  /** Largest fieldnorm representable (FieldNorm.Table(255)). */
  final val MaxFieldNorm: Int = 2013265944

  def idf(docFreq: Long, docCount: Long): Float = {
    require(docCount >= docFreq, s"$docCount >= $docFreq")
    val x = ((docCount - docFreq).toFloat + 0.5f) / (docFreq.toFloat + 0.5f)
    math.log((1.0f + x).toDouble).toFloat
  }
}

/** Scoring interface a posting cursor needs from its term's weight. */
trait TermWeight extends Serializable {
  def score(fieldNormId: Byte, termFreq: Int): Float
  def maxScore: Float
}

/** BM25F per-(term,field) weight (re-derivation of the reference's
  * Bm25FWeight, crates/core/src/ranking/bm25f.rs:129-180): shared idf
  * across fields (doc freq approximated by the AllBody/content field,
  * bm25f.rs:27-50) with the field's own average fieldnorm, and the
  * field coefficient scaling the term frequency INSIDE the saturation:
  * score = idf * (tf*c*(k1+1)) / (tf*c + k1*(1-b+b*fieldnorm/avg)). */
final class Bm25FWeight(val idfWeight: Float, avgFieldNorm: Float,
                        val coefficient: Float) extends TermWeight {
  private val cache: Array[Float] = {
    val c = new Array[Float](256)
    var id = 0
    while (id < 256) {
      val fn = FieldNorm.idToFieldNorm(id).toFloat
      c(id) = Bm25.K1 * (1.0f - Bm25.B + Bm25.B * fn / avgFieldNorm)
      id += 1
    }
    c
  }

  def score(fieldNormId: Byte, termFreq: Int): Float = {
    if (termFreq == 0) return 0.0f
    val tf = termFreq.toFloat * coefficient
    idfWeight * (tf * (Bm25.K1 + 1.0f)) / (tf + cache(fieldNormId & 0xff))
  }

  /** Supremum over tf (the factor tends to k1+1). */
  def maxScore: Float = idfWeight * (Bm25.K1 + 1.0f)
}

/** Per-term BM25 weight with the 256-entry tf-component cache
  * (reference: Bm25Weight, crates/tantivy/src/query/bm25.rs:79-196). */
final class Bm25Weight(val weight: Float, val avgFieldNorm: Float) extends TermWeight {
  private val cache: Array[Float] = {
    val c = new Array[Float](256)
    var id = 0
    while (id < 256) {
      val fn = FieldNorm.idToFieldNorm(id).toFloat
      c(id) = Bm25.K1 * (1.0f - Bm25.B + Bm25.B * fn / avgFieldNorm)
      id += 1
    }
    c
  }

  @inline def tfFactor(fieldNormId: Byte, termFreq: Int): Float = {
    val tf = termFreq.toFloat
    tf / (tf + cache(fieldNormId & 0xff))
  }

  @inline def score(fieldNormId: Byte, termFreq: Int): Float =
    weight * tfFactor(fieldNormId, termFreq)

  /** Valid upper bound over any (fieldnorm, tf). */
  def maxScore: Float = score(255.toByte, Bm25.MaxFieldNorm)
}

object Bm25Weight {
  /** Query-time weight for one term from collection statistics. */
  def forTerm(docFreq: Long, totalDocs: Long, avgFieldNorm: Float): Bm25Weight =
    new Bm25Weight(Bm25.idf(docFreq, totalDocs) * (1.0f + Bm25.K1), avgFieldNorm)
}
