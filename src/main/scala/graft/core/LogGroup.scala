package graft.core

/** Logarithmic rank bucketing (reference: crates/core/src/log_group.rs
  * — `LogGroup` splits 0..numItems into `groups` exponentially-growing
  * buckets; `HarmonicRankGroup` inverts so the TOP-ranked items land
  * in the HIGHEST group; backlink_grouper.rs feeds the schema's
  * grouped-backlink fields from it with NUM_GROUPS = 10). Reproduced
  * op-for-op: base = exp(ln(n)/groups), group(item) =
  * min(trunc(ln(item+1)/ln(base)), groups-1) — `ln(base)` is the log
  * of the ROUNDED base, like the reference's `f64::log(self, base)`,
  * and the truncation is toward zero (`as u64`). Pinned by the
  * reference's own test vectors in LogGroupSpec. */
final class LogGroup(numItems: Long, val numGroups: Long) {
  val base: Double = math.exp(math.log(numItems.toDouble) / numGroups.toDouble)
  /** ln of the rounded base — expose it so column-expression ports use
    * the IDENTICAL divisor (see Webgraph.groupedBacklinks). */
  val lnBase: Double = math.log(base)

  def group(item: Long): Long =
    math.min((math.log((item + 1).toDouble) / lnBase).toLong, numGroups - 1)
}

/** Groups by harmonic-centrality rank, best rank → highest group
  * (log_group.rs:38-52). */
final class HarmonicRankGroup(numHosts: Long, groups: Long) {
  val logGroup = new LogGroup(numHosts, groups)
  def group(rank: Long): Long =
    logGroup.numGroups - logGroup.group(rank) - 1
}
