package graft

import org.apache.spark.sql.SparkSession
import graft.index._

/** Library smoke driver: corpus -> build -> query, printed to stdout.
  * Usage: runMain graft.Demo [numDocs] [outDir] */
object Demo {
  def main(args: Array[String]): Unit = {
    val numDocs = if (args.length > 0) args(0).toLong else 2000L
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graftdemo").toString
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[8]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val corpus = Corpus.generate(spark, numDocs)
    val report = IndexBuilder.build(spark, corpus, outDir,
      IndexBuilder.Config(numSegments = 8))
    println(s"[demo] build: $report")
    val again = IndexBuilder.build(spark, corpus, outDir,
      IndexBuilder.Config(numSegments = 8))
    println(s"[demo] rebuild (resume should skip all): $again")

    val index = new InvertedIndex(spark, outDir)
    println(s"[demo] stats: ${index.stats}")

    def show(q: String, mode: String = "or", minus: Seq[String] = Nil): Unit = {
      val t0 = System.nanoTime()
      val hits = index.search(q, 5, mode, minus)
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[demo] query='$q' mode=$mode minus=$minus ($ms%.0f ms)")
      hits.foreach(h => println(f"    #${h.rank} seg=${h.segment} doc=${h.docId} score=${h.score}%.6f  ${h.repo}/${h.path}"))
      if (hits.isEmpty) println("    (no hits)")
    }

    show("spark session")
    show("query engine block wand")
    show("the")                       // hottest term
    show("spark session", "and")
    show("spark", minus = Seq("session"))
    show("zzsalt42a")                 // unique per-doc salt token
    show("nosuchtoken qqqqq")         // no hits expected
    show("c++ café")                  // tokenizer path
    spark.stop()
  }
}
