package graft

import org.apache.spark.sql.SparkSession
import graft.index.{Corpus, IndexBuilder}

/** Single measured index build in a fresh JVM — the unit of the
  * scaling-efficiency protocol. Symmetric conditions per level: same
  * warmup, same input, own JIT/heap. Prints `GRAFT_RATE <docsPerSec>
  * <seconds>` as the last line. Args: cpus numDocs numSegments. */
object BuildOnce {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val numDocs = args(1).toLong
    val segments = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-build-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: enough docs to carry the hot paths through C2 (discarded)
    IndexBuilder.build(spark, Corpus.generate(spark, 20000, partitions = cpus * 2),
      java.nio.file.Files.createTempDirectory("graftwarm").toString,
      IndexBuilder.Config(numSegments = 16))
    val out = java.nio.file.Files.createTempDirectory("graftbuild").toString
    val corpus = Corpus.generate(spark, numDocs, partitions = cpus * 4)
    val positions = sys.env.getOrElse("GRAFT_POSITIONS", "1") == "1"
    val t0 = System.nanoTime()
    val report = IndexBuilder.build(spark, corpus, out,
      IndexBuilder.Config(numSegments = segments, recordPositions = positions))
    val sec = (System.nanoTime() - t0) / 1e9
    require(report.numDocs == numDocs, s"build lost rows: $report")
    println(f"GRAFT_RATE ${numDocs / sec}%.1f $sec%.2f")
    spark.stop()
  }
}
