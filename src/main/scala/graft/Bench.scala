package graft

import org.apache.spark.sql.SparkSession

import graft.index.{Corpus, IndexBuilder, InvertedIndex}

/** Benchmark main. Two modes:
  *
  *  - default (driver contract): times every SparkEntry query on
  *    SPARK_GRAFT_SF_DIR at local[SPARK_GRAFT_CPUS]; prints ONE JSON
  *    line {"metric":...,"queries":{...}}.
  *  - GRAFT_BENCH_SCALING=1: north-rule protocol — build the synthetic
  *    source-code index at two parallelism levels (local[8] vs
  *    local[32]) on the same input, measure docs/sec each, report
  *    scaling efficiency R32/(4*R8), plus warm BM25 query p50/p95 over
  *    the fixture query set. Extends the JSON line with those fields.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Index-build throughput at one parallelism level. Returns
    * (docsPerSec, elapsedSec). */
  def buildThroughput(cpus: Int, numDocs: Long, segments: Int): (Double, Double) = {
    val spark = session(cpus)
    // warm JVM: small untimed build first (BASELINE.md protocol — the
    // first pass is discarded; JIT + codegen + committer paths warm up)
    val warmDir = java.nio.file.Files.createTempDirectory(s"graftwarm$cpus").toString
    IndexBuilder.build(spark, Corpus.generate(spark, 2000, partitions = cpus),
      warmDir, IndexBuilder.Config(numSegments = 8))
    val out = java.nio.file.Files.createTempDirectory(s"graftbench$cpus").toString
    val corpus = Corpus.generate(spark, numDocs, partitions = cpus * 4)
    val t0 = System.nanoTime()
    val report = IndexBuilder.build(spark, corpus, out,
      IndexBuilder.Config(numSegments = segments))
    val sec = (System.nanoTime() - t0) / 1e9
    require(report.numDocs == numDocs, s"build lost rows: $report")
    spark.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    (numDocs / sec, sec)
  }

  /** Warm query latencies (sec) over the fixture query set. */
  def queryLatencies(spark: SparkSession, dir: String, reps: Int): Seq[Double] = {
    val idx = new InvertedIndex(spark, dir)
    val queries = Seq(
      "spark session", "query engine", "the license", "index merge sort",
      "data table row column", "great website", "tok100", "hash join group",
      "partition shuffle", "c++ runner")
    idx.search(queries.head, 20) // warm-up pass (JIT + parquet footer cache)
    (0 until reps).flatMap { _ =>
      queries.map { q =>
        val t0 = System.nanoTime()
        idx.searchRaw(q, 20, "or")
        (System.nanoTime() - t0) / 1e9
      }
    }
  }

  private def pct(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(p * s.length).toInt - 1).max(0))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val scaling = sys.env.getOrElse("GRAFT_BENCH_SCALING", "0") == "1"
    val benchDocs = sys.env.getOrElse("GRAFT_BENCH_DOCS", "60000").toLong

    var extra = ""
    if (scaling) {
      // north-rule two-cluster-size stand-in: same input, local[8] vs
      // local[32], efficiency = R32 / (4 * R8)
      val (r8, t8) = buildThroughput(8, benchDocs, 64)
      val (r32, t32) = buildThroughput(32, benchDocs, 64)
      val eff = r32 / (4.0 * r8)
      extra = f""","build_docs":$benchDocs,"r8_docs_per_sec":$r8%.1f,"t8_sec":$t8%.2f,"r32_docs_per_sec":$r32%.1f,"t32_sec":$t32%.2f,"scaling_efficiency":$eff%.3f"""
      if (sys.env.getOrElse("GRAFT_BENCH_SCALING_ONLY", "0") == "1") {
        println(s"""{"metric":"scaling_only","value":0,"unit":"sec","queries":{}$extra}""")
        return
      }
    }

    val spark = session(cpus)
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      results(name) = (System.nanoTime() - t0) / 1e9
    }

    // BM25 query latency over a freshly built index on the bench corpus
    val qdir = java.nio.file.Files.createTempDirectory("graftbenchq").toString
    val corpus = Corpus.generate(spark, 20000, partitions = cpus * 2)
    IndexBuilder.build(spark, corpus, qdir, IndexBuilder.Config(numSegments = 8))
    val lats = queryLatencies(spark, qdir, reps = 3)
    val p50 = pct(lats, 0.50)
    val p95 = pct(lats, 0.95)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"query_p50_sec":$p50%.4f,"query_p95_sec":$p95%.4f$extra}""")
    spark.stop()
  }
}
