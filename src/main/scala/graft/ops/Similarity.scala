package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search over an Array[Float] column — brute-force
  * cosine as the exact baseline, LSH-bucketed (random hyperplane signs)
  * as the scale path. All column-expression based (zip_with/aggregate),
  * fully codegen'd; no UDFs. */
object Similarity {

  /** dot(a, b) in double precision (deterministic array-order sum). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine against one query vector (broadcast as a
    * literal array): one scan + TakeOrderedAndProject. */
  def topKCosine(df: DataFrame, idCol: String, vecCol: String,
                 query: Array[Float], k: Int): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol),
        round(cosine(col(vecCol), q), 4).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Brute-force kNN join for a bounded probe set (probe broadcast).
    * For full corpus-x-corpus at scale use `lshBuckets` first. */
  def knnJoin(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"),
      col(vecCol).as("probe_vec")))
    val scored = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
      .crossJoin(p)
      .where(col("probe_id") =!= col("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        round(cosine(col("probe_vec"), col("nbr_vec")), 4).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("probe_id", "nbr_id", "cos", "rnk")
  }

  /** Deterministic pseudo-random hyperplane b (hash-derived; the same
    * constants are inlined into the DuckDB oracle as list literals). */
  def plane(b: Int, dim: Int): Array[Float] = {
    val a = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val h = graft.index.IndexBuilder.fnv1a64(s"lsh:$b:$i")
      a(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat * 2f - 1f
      i += 1
    }
    a
  }

  /** Sign-LSH bucket id: bit b = sign(dot(vec, hyperplane_b)) with
    * deterministic pseudo-random hyperplanes derived from (b, dim)
    * hashes — the IVF/LSH scale path: candidates are joined per bucket
    * instead of all-pairs. */
  def lshBucket(vec: Column, dim: Int, bits: Int): Column =
    (0 until bits).map { b =>
      when(dot(vec, typedLit(plane(b, dim))) >= 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate kNN join at scale: corpus and probes bucket by
    * sign-LSH, candidates pair WITHIN a bucket (shuffle keyed by bucket
    * id — no corpus-x-probes cross join), exact cosine reranks inside.
    * Recall trades off with `bits` (more bits = smaller buckets = fewer
    * candidates); multi-probe variants add neighboring buckets. The
    * exact `knnJoin` stays the oracle for bounded probe sets. */
  def lshKnnJoin(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, k: Int, dim: Int, bits: Int = 8): DataFrame = {
    val cb = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
      lshBucket(col(vecCol), dim, bits).as("bucket"))
    val pb = probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      lshBucket(col(vecCol), dim, bits).as("bucket"))
    val scored = cb.join(pb, "bucket")
      .where(col("probe_id") =!= col("nbr_id"))
      .select(col("probe_id"), col("nbr_id"),
        round(cosine(col("probe_vec"), col("nbr_vec")), 4).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("cos").desc, col("nbr_id"))
    scored.withColumn("rnk", row_number().over(w)).where(col("rnk") <= k)
      .select("probe_id", "nbr_id", "cos", "rnk")
  }
}
