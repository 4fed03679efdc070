package graft

/** No-Spark probe: does the tokenize+accumulate kernel itself scale
  * with threads on this host? */
object KernelThreadProbe {
  def main(args: Array[String]): Unit = {
    val docs = (0L until 24000L).map(i => graft.index.Corpus.mkDoc(i, 42L, skew = false)).toArray
    println(s"[kp] generated ${docs.length} docs")
    for (threads <- Seq(8, 32, 8, 32)) {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val chunk = docs.length / (threads * 8)
      val t0 = System.nanoTime()
      val futs = docs.grouped(chunk).map { g =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = {
            var acc = 0L
            g.foreach { d => acc += graft.core.Tokenizers.termFreqs(d.content).size }
            acc
          }
        })
      }.toList
      val total = futs.map(_.get()).sum
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kp] threads=$threads%2d tokenize: $sec%.2f s (${docs.length / sec}%.0f docs/s, check=$total)")
      pool.shutdown()
    }
  }
}
