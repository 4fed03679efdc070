package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1): isolates single
  * queries outside the frozen `graft.Bench` suite. NOT part of the
  * driver contract — `Bench` stays the artifact of record; numbers from
  * here are cited in OPTIMIZATION_r*.md as isolation evidence only.
  *
  * Usage: runMain graft.BenchExtra q_name [q_name ...]
  *  - env SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS: as Bench.
  *  - env GRAFT_EXTRA_REPS (default 3): timed repetitions per query.
  *  - env GRAFT_EXTRA_NOOP=1: time a noop-sink write (computes every
  *    column of every row, guide §1.4) instead of Bench's count()
  *    action.
  *  - env GRAFT_EXTRA_PLAN_DIR: when set, also writes
  *    <dir>/<query>.txt with the explain("formatted") plan.
  *  - env GRAFT_EXTRA_NO_WARM=1: skip the shared-index warmup (to see
  *    a query's cold cost including the transient index build).
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("GRAFT_EXTRA_REPS", "3").toInt
    val noop = sys.env.getOrElse("GRAFT_EXTRA_NOOP", "0") == "1"
    val planDir = sys.env.get("GRAFT_EXTRA_PLAN_DIR")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-extra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("GRAFT_EXTRA_LOGLEVEL", "WARN"))
    if (sys.env.getOrElse("GRAFT_EXTRA_NO_WARM", "0") != "1") {
      try {
        spark.read.parquet(s"$sfDir/nation.parquet")
          .groupBy("n_regionkey").count().count()
        SparkEntry.warm(spark, sfDir)
      } catch { case _: Throwable => () }
    }
    val names = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"$name: no such query")
        case Some(fn) =>
          planDir.foreach { dir =>
            new java.io.File(dir).mkdirs()
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$dir/$name.txt"), plan)
          }
          val times = (0 until reps).map { _ =>
            spark.sparkContext.setJobDescription(name)
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            if (noop) df.write.format("noop").mode("overwrite").save()
            else df.count()
            (System.nanoTime() - t0) / 1e9
          }
          spark.sparkContext.setJobDescription(null)
          println(f"EXTRA $name%-28s ${times.map(t => f"$t%.3f").mkString(" ")}")
      }
    }
    spark.stop()
  }
}
