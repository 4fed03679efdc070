package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.index.SourceDoc

/** Webgraph construction — the reference builds page- and host-level
  * link graphs from crawled pages (crates/core/src/webgraph/) and
  * feeds them to the centrality jobs. Code-corpus analog: each doc's
  * outgoing link targets (`SourceDoc.links` — dependency references of
  * the doc's repo) aggregate into a weighted repo→repo edge table, the
  * exact input shape ops.Centrality consumes and
  * IndexBuilder.Config.centrality stores.
  *
  * Scale shape: one explode (narrow) + one groupBy keyed by (src, dst)
  * — a single shuffle whose key space is the edge set, with map-side
  * partial aggregation; no corpus×corpus joins, no driver-side state.
  */
object Webgraph {

  /** Doc-level edge list (repo, path, dst): one row per outgoing link
    * occurrence — the page-level graph analog. */
  def docEdges(docs: Dataset[SourceDoc]): DataFrame =
    docs.select(col("repo"), col("path"), explode(col("links")).as("dst"))

  /** Repo(host)-level weighted graph (src, dst, weight): self-loops
    * dropped, weight = number of doc-level link occurrences — the
    * host-graph aggregation the reference's centrality ranks over. */
  def repoGraph(docs: Dataset[SourceDoc]): DataFrame =
    docs.select(col("repo").as("src"), explode(col("links")).as("dst"))
      .where(col("src") =!= col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
}
