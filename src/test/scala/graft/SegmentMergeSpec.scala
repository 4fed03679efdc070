package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.index._

/** Record-level merge: K segments -> K/fanIn, results must stay exact. */
class SegmentMergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmpDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graftmerge").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private lazy val corpus = Corpus.generate(spark, 600, seed = 7L, partitions = 5).cache()

  private lazy val (srcDir, srcIdx) = {
    val d = tmpDir()
    IndexBuilder.build(spark, corpus, d, IndexBuilder.Config(numSegments = 6))
    (d, new InvertedIndex(spark, d))
  }

  private val queries = Seq("spark session", "the", "license apache spark",
    "query engine block", "zzsalt7a", "data table row")

  private def checkMerged(fanIn: Int, cfg: IndexBuilder.Config): Unit = {
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn, cfg)
    val merged = new InvertedIndex(spark, out)
    assert(merged.stats.numDocs == 600)
    assert(merged.stats.numTokens == srcIdx.stats.numTokens)
    assert(merged.stats.numSegments == (6 + fanIn - 1) / fanIn)
    // rank-identity within the merged index: WAND == exhaustive
    queries.foreach { q =>
      val w = merged.searchRaw(q, 20, "or")
      val e = merged.searchRaw(q, 20, "exhaustive")
      assert(w.toSeq == e.toSeq, s"merged fanIn=$fanIn query '$q'")
    }
    // same documents and scores as the unmerged index (doc ids remap)
    queries.foreach { q =>
      val a = srcIdx.search(q, 20, "or").map(h => (h.repo, h.path, h.score)).toSet
      val b = merged.search(q, 20, "or").map(h => (h.repo, h.path, h.score)).toSet
      assert(a == b, s"fanIn=$fanIn query '$q'")
    }
    // positions survive the merge: phrase results identical
    Seq("the license", "spark session").foreach { p =>
      val a = srcIdx.search(p, 1000, "phrase").map(h => (h.repo, h.path, h.score)).toSet
      val b = merged.search(p, 1000, "phrase").map(h => (h.repo, h.path, h.score)).toSet
      assert(a == b, s"fanIn=$fanIn phrase '$p'")
    }
    // doc table integrity: every (repo, path) still present exactly once
    import spark.implicits._
    assert(merged.docs.map(d => (d.repo, d.path)).distinct().count() == 600)
  }

  test("merged doc ids are globally score-sorted (docid-order invariant)") {
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3, IndexBuilder.Config())
    val merged = new InvertedIndex(spark, out)
    merged.docs.collect().groupBy(_.segment).foreach { case (seg, ds) =>
      val byId = ds.sortBy(_.docId).map(d => (d.repo, d.path)).toSeq
      val byScore = ds.sortBy(d => (d.sortKey, d.repo, d.path, d.commit))(
        Ordering.Tuple4(Ordering.Long.reverse, Ordering.String,
          Ordering.String, Ordering.String)).map(d => (d.repo, d.path)).toSeq
      assert(byId == byScore, s"merged seg $seg lost the docid-order invariant")
    }
  }

  test("merge to one segment == fresh single-segment build (approx path)") {
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn = 6, IndexBuilder.Config())
    val merged = new InvertedIndex(spark, out)
    val freshDir = tmpDir()
    IndexBuilder.build(spark, corpus, freshDir, IndexBuilder.Config(numSegments = 1))
    val fresh = new InvertedIndex(spark, freshDir)
    // identical score-ordered id assignment
    assert(merged.docs.collect().map(d => (d.docId, d.repo, d.path)).sortBy(_._1).toSeq ==
      fresh.docs.collect().map(d => (d.docId, d.repo, d.path)).sortBy(_._1).toSeq)
    // ShortCircuit/searchApprox truncation now means the same "top
    // static-rank prefix" on a merged index as on a fresh one
    Seq("spark session", "the license", "data table row").foreach { q =>
      val a = merged.searchApprox(q, 10, 200)
      val b = fresh.searchApprox(q, 10, 200)
      assert(a._1.toSeq == b._1.toSeq && a._2 == b._2 && a._3 == b._3,
        s"approx mismatch on '$q'")
    }
  }

  test("merge 6 -> 3 segments") { checkMerged(2, IndexBuilder.Config()) }
  test("merge 6 -> 1 segment") { checkMerged(6, IndexBuilder.Config()) }
  test("merge with hot-term re-sharding") {
    checkMerged(3, IndexBuilder.Config(maxPostingsPerShard = 128))
  }

  test("merge commits exactly-once: a re-run is a no-op, not a duplication") {
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3)
    val merged = new InvertedIndex(spark, out)
    val docsBefore = merged.docs.count()
    val hitsBefore = merged.search("spark session", 10, "or").toSeq
    // re-running the same merge must hit the batch marker and change
    // NOTHING (bare Append would double every row)
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3)
    val again = new InvertedIndex(spark, out)
    assert(again.docs.count() == docsBefore)
    assert(again.stats.numDocs == merged.stats.numDocs)
    assert(again.search("spark session", 10, "or").toSeq == hitsBefore)
  }

  test("merge identity covers the full input set, not just endpoints") {
    // two filtered merges sharing first/last segment ids but differing
    // in membership are DIFFERENT merges: the endpoint-only tag used to
    // satisfy the second from the first's marker, silently skipping it
    // (ADVICE r04). Lineage-hashed tags commit each set separately,
    // while a true re-run of the same set stays a no-op.
    val out = tmpDir()
    def markers(): Seq[String] =
      Option(new java.io.File(IndexBuilder.manifestDir(out)).listFiles())
        .getOrElse(Array.empty).map(_.getName).filter(_.startsWith("batch-merge")).toSeq
    SegmentMerge.merge(spark, srcDir, out, fanIn = 6, segFilter = _ != 2)
    assert(markers().size == 1)
    // exact re-run of the same filtered set: idempotent no-op
    SegmentMerge.merge(spark, srcDir, out, fanIn = 6, segFilter = _ != 2)
    assert(markers().size == 1)
    // same endpoints (0..5), different middle: must NOT be skipped
    SegmentMerge.merge(spark, srcDir, out, fanIn = 6, segFilter = _ != 3)
    assert(markers().size == 2, "a different input set must commit its own marker")
  }

  test("merged segments preserve exact per-doc numTokens (end-anchor contract)") {
    // Content END-anchored patterns read DocRow.numTokens for the exact
    // token count; a merge that bucketed or recomputed it would silently
    // break end-anchored matches on compacted indexes
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3)
    val merged = new InvertedIndex(spark, out)
    import spark.implicits._
    val before = srcIdx.docs.map(d => ((d.repo, d.path), d.numTokens)).collect().toMap
    val after = merged.docs.map(d => ((d.repo, d.path), d.numTokens)).collect().toMap
    assert(after.size == before.size)
    assert(after == before, "numTokens must survive the merge bit-exactly")
  }

  test("merge refreshes the stored global-rank table; re-run heals a lost one") {
    val out = tmpDir()
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3,
      IndexBuilder.Config(storeGlobalRank = true))
    val merged = new InvertedIndex(spark, out)
    val stats = merged.segStats.collect().toSeq
    val g0 = GlobalRank.load(spark, out, stats)
    assert(g0.nonEmpty, "post-merge table must validate against the merged segs")
    // ordinals equal the strict-precede law over the MERGED doc table
    val all = merged.docs.collect()
    val g = g0.get.collect().map(r => (r.segment, r.docId) -> r.grank).toMap
    def precedes(x: DocRow, y: DocRow): Boolean =
      x.sortKey > y.sortKey || (x.sortKey == y.sortKey &&
        Ordering.Tuple3(Ordering.String, Ordering.String, Ordering.String)
          .lt((x.repo, x.path, x.commit), (y.repo, y.path, y.commit)))
    all.take(50).foreach { r =>
      assert(g((r.segment, r.docId)) == all.count(o => precedes(o, r)).toLong)
    }
    // crash-between-marker-and-refresh: delete the table, re-run the
    // committed merge — the early-return path must heal it
    def rmTree(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.list(p).forEach(rmTree(_))
      java.nio.file.Files.deleteIfExists(p)
    }
    rmTree(java.nio.file.Paths.get(GlobalRank.dirOf(out)))
    assert(GlobalRank.load(spark, out, stats).isEmpty)
    SegmentMerge.merge(spark, srcDir, out, fanIn = 3,
      IndexBuilder.Config(storeGlobalRank = true))
    assert(GlobalRank.load(spark, out, stats).nonEmpty)
    // and the merge itself stayed a no-op (no duplication)
    assert(new InvertedIndex(spark, out).stats.numDocs == 600)
  }

  test("mixed recordPositions segments refuse to merge loudly") {
    import spark.implicits._
    val dir = tmpDir()
    new java.io.File(IndexBuilder.manifestDir(dir)).mkdirs()
    val mk = (r: String, text: String) =>
      SourceDoc(r, "f.md", "c", "en", text)
    graft.streaming.LiveIndex.appendBatch(
      spark.createDataset(Seq(mk("r1", "alpha beta shared words"))), 0L, dir,
      IndexBuilder.Config(numSegments = 1, recordPositions = true))
    graft.streaming.LiveIndex.appendBatch(
      spark.createDataset(Seq(mk("r2", "alpha gamma shared words"))), 1L, dir,
      IndexBuilder.Config(numSegments = 1, recordPositions = false))
    val out = tmpDir()
    val e = intercept[Exception] {
      SegmentMerge.merge(spark, dir, out, fanIn = Int.MaxValue)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("recordPositions")),
      s"expected the mixed-config rejection, got $e")
  }

  test("skew stress: 95%-df hot term shards through build and merge") {
    // FIXTURES.md §1 skew variant: 'license' injected into ~95% of docs
    val skew = Corpus.generate(spark, 500, seed = 13L, skew = true).cache()
    val src = tmpDir()
    IndexBuilder.build(spark, skew, src,
      IndexBuilder.Config(numSegments = 4, maxPostingsPerShard = 64))
    val idx = new InvertedIndex(spark, src)
    import spark.implicits._
    // the hot term must actually be sharded (df per segment ~119 > 64)
    val hotShards = idx.postings.filter(p => p.term == "license" && p.shard > 0).count()
    assert(hotShards > 0, "expected hot-term shards")
    val out = tmpDir()
    SegmentMerge.merge(spark, src, out, fanIn = 4,
      IndexBuilder.Config(maxPostingsPerShard = 64))
    val merged = new InvertedIndex(spark, out)
    // merged hot list re-sharded, results exact
    assert(merged.postings.filter(p => p.term == "license" && p.shard > 0).count() > 0)
    Seq("license", "license apache", "license spark data").foreach { q =>
      val w = merged.searchRaw(q, 20, "or")
      val e = merged.searchRaw(q, 20, "exhaustive")
      assert(w.toSeq == e.toSeq, s"skew query '$q'")
      val a = idx.search(q, 20, "or").map(h => (h.repo, h.path, h.score)).toSet
      val b = merged.search(q, 20, "or").map(h => (h.repo, h.path, h.score)).toSet
      assert(a == b, s"skew query '$q' merged vs source")
    }
    skew.unpersist()
  }
}
