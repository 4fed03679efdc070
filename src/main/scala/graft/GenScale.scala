package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the driver's synthetic star
  * schema: `runMain graft.GenScale <inSfDir> <outDir> [factor]` writes
  * factor× copies of every fact table with disjoint key ranges (copy c
  * offsets every join key by c·(max+1), so the copies behave like
  * independent shards and referential integrity is preserved), keeps
  * the dimension tables (region, nation) as-is, and perturbs copied
  * document text with a per-copy salt token so scaled corpora stress
  * the dedup/shingle pipelines as near-duplicates rather than exact
  * ones. Copy 0 is bit-identical to the input, so every driver face
  * that slices a deterministic id prefix (doc_id < N) sees the same
  * rows at every scale.
  *
  * Output layout matches the driver's (one `<table>.parquet` FILE per
  * table), so Verify/Bench and the DuckDB oracle read a scaled dir
  * exactly like a driver-provided one. No randomness anywhere — same
  * input and factor give byte-identical results.
  */
object GenScale {

  private def moveSingleFile(dir: String, dest: String): Unit = {
    import java.nio.file._
    val d = Paths.get(dir)
    val listed = Files.list(d)
    val part =
      try listed.filter(p =>
        p.getFileName.toString.startsWith("part-") &&
          p.getFileName.toString.endsWith(".parquet")).findFirst()
      finally listed.close()
    require(part.isPresent, s"no part-*.parquet produced under $dir")
    Files.move(part.get(), Paths.get(dest), StandardCopyOption.REPLACE_EXISTING)
    val walked = Files.walk(d)
    try walked.sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    finally walked.close()
  }

  private def writeTable(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    moveSingleFile(tmp, s"$outDir/$name.parquet")
  }

  /** max(key)+1 of a long/int key column, as Long. */
  private def span(df: DataFrame, key: String): Long = {
    val row = df.agg(max(col(key).cast("long"))).head()
    require(!row.isNullAt(0), s"cannot scale an empty table (key $key)")
    row.getLong(0) + 1L
  }

  def main(args: Array[String]): Unit = {
    val in = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, in, out, factor)
    println(s"GENSCALE wrote $out at factor $factor")
    spark.stop()
  }

  /** The generator body (spec-drivable: does not own the session). */
  def generate(spark: SparkSession, in: String, out: String,
               factor: Int): Unit = {
    require(factor >= 1, "factor >= 1")
    new java.io.File(out).mkdirs()

    def t(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")

    // dimensions pass through untouched
    Seq("region", "nation").foreach(n => writeTable(t(n), out, n))

    /** factor copies with the listed long-key columns offset by
      * c·span(key from its OWNING table) — the offsets map is
      * (column -> span) so foreign keys shift in lockstep. */
    def copies(df: DataFrame, offsets: Map[String, Long])
              (extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { c =>
        val shifted = offsets.foldLeft(df) { case (acc, (k, sp)) =>
          acc.withColumn(k, (col(k).cast("long") + lit(sp * c))
            .cast(df.schema(k).dataType))
        }
        extra(shifted, c)
      }.reduce(_ unionByName _)

    val custSpan = span(t("customer"), "c_custkey")
    val suppSpan = span(t("supplier"), "s_suppkey")
    val partSpan = span(t("part"), "p_partkey")
    val orderSpan = span(t("orders"), "o_orderkey")

    writeTable(copies(t("customer"), Map("c_custkey" -> custSpan))(),
      out, "customer")
    writeTable(copies(t("supplier"), Map("s_suppkey" -> suppSpan))(),
      out, "supplier")
    writeTable(copies(t("part"), Map("p_partkey" -> partSpan))(),
      out, "part")
    writeTable(copies(t("orders"),
      Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan))(),
      out, "orders")
    writeTable(copies(t("lineitem"),
      Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
        "l_suppkey" -> suppSpan))(),
      out, "lineitem")
    writeTable(copies(t("events"),
      Map("event_id" -> span(t("events"), "event_id"),
        "user_id" -> span(t("events"), "user_id")))(),
      out, "events")
    // documents: salt copied text (near-duplicates, not exact) and keep
    // the n_chars == length(text) invariant the input satisfies
    writeTable(copies(t("documents"),
      Map("doc_id" -> span(t("documents"), "doc_id"))) { (df, c) =>
        if (c == 0) df
        else df.withColumn("text", concat(col("text"), lit(s" scopy$c")))
          .withColumn("n_chars", length(col("text")).cast("long"))
      }, out, "documents")
    writeTable(copies(t("embeddings"),
      Map("vec_id" -> span(t("embeddings"), "vec_id")))(),
      out, "embeddings")
  }
}
