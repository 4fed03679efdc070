package graft.index

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Input ingestion for the north-rule contract: an Iceberg table of
  * source-code repositories with columns
  * (repo string, path string, commit string, lang string, content
  * string). Reading Iceberg is a FORMAT choice, not an architecture
  * one — `spark.read.format("iceberg").load(table)` (or
  * `spark.table(name)` with the Iceberg catalog configured) yields the
  * same DataFrame this module normalizes; this sandbox ships no
  * Iceberg runtime jars, so tests exercise the parquet face of the
  * identical schema and the format string stays caller-selectable.
  * Iceberg's own strengths compose cleanly with the build: snapshot
  * reads pin a consistent input for resumable builds, and partition
  * pruning happens below this layer. */
object Ingest {

  final val Columns = Seq("repo", "path", "commit", "lang", "content")

  /** Normalize any source DataFrame to the input contract. The
    * OPTIONAL `props` json column (Config.indexJson) and `links`
    * outgoing-target column (Config.indexLinks) are carried when
    * present and defaulted empty otherwise — the required north-rule
    * shape stays the five columns. */
  def normalize(df: DataFrame): Dataset[SourceDoc] = {
    import df.sparkSession.implicits._
    var out = df
    if (!out.columns.contains("props")) out = out.withColumn("props", lit(""))
    if (!out.columns.contains("links"))
      out = out.withColumn("links", array().cast("array<string>"))
    out.select((Columns ++ Seq("props", "links")).map(col): _*).as[SourceDoc]
  }

  /** Load from a path-addressed table (format "iceberg", "parquet",
    * ...). For catalog tables use `fromTable`. */
  def sourceDocs(spark: SparkSession, location: String,
                 format: String = "iceberg"): Dataset[SourceDoc] =
    normalize(spark.read.format(format).load(location))

  /** Load from a catalog table name (Iceberg catalogs resolve here). */
  def fromTable(spark: SparkSession, name: String): Dataset[SourceDoc] =
    normalize(spark.table(name))

  /** Per-row fidelity witness (input_hint: "per-row invariant vs the
    * reference: content sha256 equality"): join the built index's
    * per-doc sha256 against the ingest recomputation; returns
    * (matchedRows, mismatchedRows, missingFromIndex). Distributed —
    * one join keyed by (repo, path, commit), no driver materialization
    * beyond three counters. */
  def fidelityReport(spark: SparkSession, input: Dataset[SourceDoc],
                     indexDir: String): (Long, Long, Long) = {
    import spark.implicits._
    val expected = input.map(d =>
      (d.repo, d.path, d.commit, IndexBuilder.sha256Hex(d.content)))
      .toDF("repo", "path", "commit", "expectedSha")
    // one row per key on BOTH sides: a doc present in several segments
    // (live re-adds) or a duplicated input row would fan the join out
    // and the three counters would no longer partition the input. A
    // key whose index copies disagree counts as mismatch (min of the
    // match flag), never as both ok and mismatch.
    val expectedByKey = expected.dropDuplicates("repo", "path", "commit")
    val got = new InvertedIndex(spark, indexDir).docs
      .select($"repo", $"path", $"commit", $"sha256")
      .groupBy($"repo", $"path", $"commit")
      .agg(min($"sha256").as("shaMin"), max($"sha256").as("shaMax"))
      .select($"repo", $"path", $"commit",
        when($"shaMin" === $"shaMax", $"shaMin").otherwise(lit("<conflict>"))
          .as("sha256"))
    val joined = expectedByKey.join(got, Seq("repo", "path", "commit"), "left")
      .select(
        when($"sha256".isNull, lit("missing"))
          .when($"sha256" === $"expectedSha", lit("ok"))
          .otherwise(lit("mismatch")).as("state"))
      .groupBy("state").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    (joined.getOrElse("ok", 0L), joined.getOrElse("mismatch", 0L),
      joined.getOrElse("missing", 0L))
  }
}
