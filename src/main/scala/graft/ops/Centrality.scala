package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Harmonic centrality over an edge table — the reference's AMPC
  * webgraph job re-expressed Spark-first (reference:
  * `crates/core/src/ampc/mod.rs:17-42` drives harmonic centrality over
  * the webgraph; the published algorithms are plain frontier BFS and
  * Boldi & Vigna's HyperBall, "In-Core Computation of Geometric
  * Centralities with HyperBall", 2013). Harmonic centrality of v =
  * Σ_{u≠v, d(u,v)<∞} 1/d(u,v) where d(u,v) is the FORWARD distance
  * u→v — i.e. it counts who can reach v, the incoming-link notion the
  * reference ranks with.
  *
  * Two paths, same contract as the HLL vocab face:
  *
  *  - [[harmonicExact]]: frontier BFS as DataFrame joins. To keep the
  *    result hash-exact across engines the score is returned as an
  *    INTEGER: h`L` = Σ L/d with L = lcm(1..maxDepth), so no float
  *    summation order exists at all (maxDepth ≤ 6 keeps L/d integral:
  *    L(4)=12, L(6)=60). The oracle is a recursive-CTE BFS.
  *  - [[harmonicHyperBall]]: per-node HLL registers of the in-ball,
  *    one round = ship each node's sketch along its out-edges and
  *    elementwise-max-merge at the destination. State is 2^p bytes per
  *    node and each round is one shuffle keyed by dst — the 100 TB
  *    path (exact BFS carries O(reachable pairs) state; HyperBall
  *    carries O(nodes · 2^p)). Estimates are deterministic: register
  *    max is commutative/associative, so partitioning cannot change
  *    the sketch.
  */
object Centrality {

  /** One node's HyperBall state: in-ball sketch registers, the
    * previous ball estimate, and the harmonic accumulator with its
    * Kahan compensation term (the reference compensates exactly this
    * accumulation, webgraph/centrality/harmonic.rs:56 — at ≤6 rounds
    * the correction is tiny, but the accumulator semantics match).
    * Public — Spark codegen requirement. */
  final case class BallState(node: Long, regs: Array[Byte],
                             prevEst: Double, harmonic: Double,
                             herr: Double = 0.0)

  // ------------------------------------------------------------- exact

  /** Above this many distinct edges the per-round frontier⋈edges join
    * stops BROADCASTING the edge side (~16 B/row → ~64 MB at this
    * default, the usual autoBroadcastJoinThreshold class) and falls
    * back to a shuffle join. harmonicExact is the oracle-exact
    * small-graph path — HyperBall is the 100 TB design — but a caller
    * that routes a big graph here by mistake must degrade to a slower
    * correct plan, not OOM the driver re-broadcasting the edge table
    * every BFS round. */
  final val ExactBroadcastMaxEdges: Long = 4L * 1000 * 1000

  /** Exact harmonic centrality (integer form): returns
    * (node, h) where h = Σ_{u reaches node, d ≤ maxDepth} lcm/d.
    * `edges` needs (src, dst) long columns; nodes = union of endpoints.
    * Each round: frontier ⋈ edges (dst = frontier node-at-ball-edge)
    * pulls the next shell, anti-join drops already-visited pairs. */
  def harmonicExact(spark: SparkSession, edges: DataFrame,
                    maxDepth: Int,
                    broadcastMaxEdges: Long = ExactBroadcastMaxEdges): DataFrame = {
    require(maxDepth >= 1 && maxDepth <= 6, "lcm trick holds for depth 1..6")
    val lcm = maxDepth match {
      case 1 => 1L; case 2 => 2L; case 3 => 6L
      case 4 => 12L; case 5 => 60L; case 6 => 60L
    }
    val e0 = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct().localCheckpoint()
    // the checkpoint above already materialized e0, so this count is a
    // cheap cached-block scan, not a recompute
    val e = if (e0.count() <= broadcastMaxEdges) broadcast(e0) else e0
    val nodes = e0.select(col("src").as("n"))
      .union(e0.select(col("dst").as("n"))).distinct().localCheckpoint()
    // visited pairs (v, u): u ∈ B(v, d); frontier = the newest shell.
    // Iterative plans need their lineage TRUNCATED each round
    // (localCheckpoint): without it the d-th round's plan nests every
    // earlier round's joins and Catalyst's optimize/codegen time grows
    // superlinearly with depth — the classic iterative-algorithm trap
    // (12 s for 4 rounds over a 500-node graph before truncation).
    // The edge side broadcasts only under the size guard above: small
    // reused relation -> broadcast; over-threshold -> shuffle join.
    var visited = nodes.select(col("n").as("v"), col("n").as("u"))
      .localCheckpoint()
    var frontier = visited
    var scores = nodes.select(col("n").as("v"), lit(0L).as("h"))
    var d = 1
    while (d <= maxDepth) {
      val next = frontier.join(e, e("dst") === frontier("u"))
        .select(col("v"), col("src").as("u")).distinct()
        .join(visited, Seq("v", "u"), "left_anti")
        .localCheckpoint()
      val shell = next.groupBy("v").agg(count(lit(1)).as("c"))
        .select(col("v"), (col("c") * lit(lcm / d)).as("add"))
      // scores/visited build on CHECKPOINTED shells only, so their own
      // lineage stays shallow (a 4-deep join/union chain) — no extra
      // materialization jobs needed for them
      scores = scores.join(shell, Seq("v"), "left_outer")
        .select(col("v"), (col("h") + coalesce(col("add"), lit(0L))).as("h"))
      visited = visited.union(next)
      frontier = next
      d += 1
    }
    scores.select(col("v").as("node"), col("h"))
  }

  // --------------------------------------------------------- HyperBall

  final val P = 8                // 2^8 = 256 registers, rsd ~6.5%
  final val M: Int = 1 << P

  private[graft] def initRegs(node: Long): Array[Byte] = {
    val regs = new Array[Byte](M)
    addTo(regs, node)
    regs
  }

  /** 64-bit avalanche finalizer (the public murmur3 fmix64 constants):
    * FNV-1a alone barely diffuses its HIGH bits for short inputs —
    * "hb:1".."hb:6" all shared the same top byte, collapsing every
    * node into one HLL register — so the register index needs a mixed
    * hash. */
  private[graft] def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private[graft] def addTo(regs: Array[Byte], v: Long): Unit = {
    val h = mix64(graft.index.IndexBuilder.fnv1a64("hb:" + v))
    val idx = (h >>> (64 - P)).toInt
    val rest = h << P
    val rank = (java.lang.Long.numberOfLeadingZeros(rest | 1L) + 1).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  private[graft] def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) {
      out(i) = if (a(i) >= b(i)) a(i) else b(i)
      i += 1
    }
    out
  }

  /** Standard HLL estimate with the small-range linear-counting
    * correction (Flajolet et al. 2007). */
  private[graft] def estimate(regs: Array[Byte]): Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    val raw = alpha * M * M / sum
    if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else raw
  }

  /** HyperBall harmonic-centrality estimates: (node, est_harmonic,
    * est_ball) after `maxDepth` rounds. Per round, every node ships
    * its current in-ball sketch along its OUT-edges (u ∈ B(x, t-1) and
    * x→v imply u ∈ B(v, t)), destinations reduce by elementwise max,
    * and the harmonic accumulator adds (est_t - est_{t-1})/t clamped
    * at 0. */
  def harmonicHyperBall(spark: SparkSession, edges: DataFrame,
                        maxDepth: Int): Dataset[BallState] = {
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .where(col("src") =!= col("dst")).distinct()
      .as[(Long, Long)].localCheckpoint()
    val nodes = e.map(_._1).union(e.map(_._2)).distinct().localCheckpoint()
    // prevEst seeds with the ESTIMATOR's view of the singleton ball,
    // not the exact 1.0: deltas subtract estimates from estimates
    // (Boldi & Vigna), and an exact seed inflates every node's first
    // delta by the estimator's singleton bias (~0.002)
    var cur: Dataset[BallState] =
      nodes.map(n => BallState(n, initRegs(n), estimate(initRegs(n)), 0.0))
        .localCheckpoint()
    var t = 1
    while (t <= maxDepth) {
      val depth = t
      // sketches travel src -> dst; reduce per destination by max-merge
      val inbound = cur.joinWith(e, cur("node") === e("src"))
        .map { case (st, (_, dst)) => (dst, st.regs) }
        .groupByKey(_._1)
        .reduceGroups((a, b) => (a._1, merge(a._2, b._2)))
        .map { case (node, (_, regs)) => (node, regs) }
      cur = cur.joinWith(inbound, cur("node") === inbound("_1"), "left_outer")
        .map { case (st, in) =>
          val regs = if (in == null) st.regs else merge(st.regs, in._2)
          val est = estimate(regs)
          val delta = math.max(est - st.prevEst, 0.0)
          val acc = Kahan.add(Kahan.KahanAcc(st.harmonic, st.herr),
            delta / depth)
          BallState(st.node, regs, est, acc.sum, acc.err)
        }.localCheckpoint() // truncate the per-round lineage (see exact)
      t += 1
    }
    cur
  }
}
