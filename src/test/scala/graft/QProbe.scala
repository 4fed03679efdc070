package graft

/** Dev probe: run one SparkEntry face and print rows + wall time.
  * Usage: Test/runMain graft.QProbe <name> <sfDir> [reps] */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkTestSession.spark
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val rows = df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[$name rep $r] ${rows.length} rows in $sec%.2f s")
      if (r == 1) rows.take(12).foreach(x => println("  " + x))
    }
    spark.stop()
  }
}
