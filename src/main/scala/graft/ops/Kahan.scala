package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Kahan (compensated) summation as a distributed Spark aggregate —
  * the reference keeps a (sum, err) pair and folds both scalars and
  * other pairs into it (crates/core/src/kahan_sum.rs:30-77, consumed
  * by the harmonic-centrality accumulators,
  * crates/core/src/webgraph/centrality/harmonic.rs:56,159).
  *
  * Spark shape: an `Aggregator[Double, KahanAcc, Double]` — `reduce`
  * is the scalar compensated add (AddAssign<f64>), `merge` is the
  * pair-into-pair compensated add (AddAssign<KahanSum>), so map-side
  * partial aggregation keeps its compensation through the shuffle.
  * Error bound: |result − exact| ≤ 2·eps·Σ|xᵢ| regardless of how many
  * partial sums the plan folds together — a plain double sum degrades
  * as O(lanes·eps·Σ|xᵢ|) and loses small addends entirely next to a
  * large running sum (the 1e16 + 1.0 case), partition order making the
  * loss nondeterministic on top.
  *
  * Scale shape: constant 16-byte state per group, codegen'd typed
  * aggregate, ordinary partial/final agg plan — nothing about the
  * compensation changes the shuffle.
  */
object Kahan {

  /** Running compensated sum. Public — Spark codegen requirement. */
  final case class KahanAcc(sum: Double, err: Double)

  /** Scalar fold: reference AddAssign<f64> (kahan_sum.rs:47-53). */
  def add(acc: KahanAcc, x: Double): KahanAcc = {
    val y = x - acc.err
    val t = acc.sum + y
    KahanAcc(t, (t - acc.sum) - y)
  }

  /** Pair fold: reference AddAssign<KahanSum> (kahan_sum.rs:64-70) —
    * the right side's own compensation (sum+err) re-enters the left's
    * compensated add, so merging partials does not discard either
    * side's accumulated correction. */
  def merge(a: KahanAcc, b: KahanAcc): KahanAcc = {
    val y = (b.sum + b.err) - a.err
    val t = a.sum + y
    KahanAcc(t, (t - a.sum) - y)
  }

  /** Driver-side fold for small sequences (the reference's iterator
    * sum); deterministic for a fixed order. */
  def sum(xs: Iterable[Double]): Double =
    xs.foldLeft(KahanAcc(0.0, 0.0))(add).sum

  /** Typed aggregator: `ds.select(Kahan.agg.toColumn)` or the
    * registered SQL/DataFrame form below. */
  val agg: Aggregator[Double, KahanAcc, Double] =
    new Aggregator[Double, KahanAcc, Double] {
      def zero: KahanAcc = KahanAcc(0.0, 0.0)
      def reduce(acc: KahanAcc, x: Double): KahanAcc = add(acc, x)
      def merge(a: KahanAcc, b: KahanAcc): KahanAcc = Kahan.merge(a, b)
      def finish(acc: KahanAcc): Double = acc.sum
      def bufferEncoder: Encoder[KahanAcc] = Encoders.product[KahanAcc]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** DataFrame-face aggregate: `df.agg(Kahan.sumCol(col("x")))`. */
  def sumCol(c: Column): Column = udaf(agg).apply(c)
}
