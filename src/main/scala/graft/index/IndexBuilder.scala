package graft.index

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.{Bm25Weight, FieldNorm, PostingListData, Tokenizers}

/** Distributed inverted-index build.
  *
  * Shape (re-derivation of the reference's indexer architecture,
  * entrypoint/indexer/mod.rs:43-89 + inverted_index/indexing.rs:32-47,
  * re-expressed Spark-first):
  *
  *   read -> tag (segment, sortKey, sha256-ready) [narrow]
  *        -> repartition by segment + sortWithinPartitions   [1 shuffle]
  *        -> mapPartitions: per segment, assign dense docIds in
  *           precomputed-score order, tokenize once, accumulate in-RAM
  *           postings (the Spark analog of the reference's writer arena),
  *           serialize blocks, emit doc/fnorm/posting/stat rows
  *        -> write parquet partitioned by row kind            [no shuffle]
  *
  * Scale notes:
  *  - exactly ONE full-data shuffle (the segment repartition). The
  *    reference avoids it by making "segment" == input file; we pay it to
  *    make the index byte-identical at any parallelism (needed for
  *    rank-identity + the N-vs-4N scaling protocol) and to balance
  *    segments. Everything after the shuffle is narrow.
  *  - a segment's postings must fit in task memory, like the reference's
  *    1 GB writer arena (indexing.rs:38-39). Segment count is chosen so
  *    corpus/numSegments stays in budget; at 10^12 files you raise
  *    numSegments, not executor memory.
  *  - hot terms are sharded at maxPostingsPerShard entries per posting
  *    row, bounding both row size and query-task memory per term.
  *  - checkpoint/resume at segment granularity: segments are built in
  *    batches; a manifest JSON per segment commits after its batch's
  *    write; a restarted job skips manifested segments (north rule:
  *    "restarts at segment granularity").
  */
object IndexBuilder {

  final case class Config(
      numSegments: Int = 8,
      maxPostingsPerShard: Int = 1 << 20,
      fnormChunkSize: Int = 1 << 23,
      segmentsPerBatch: Int = 1 << 16,
      recordPositions: Boolean = true,
      indexStemmed: Boolean = false,
      indexBigrams: Boolean = false,
      indexTrigrams: Boolean = false,
      /** store a 64-bit SimHash per doc for the BucketCollector's
        * near-dup drain (costs a token re-walk; off for the north-rule
        * build config). */
      computeSimhash: Boolean = false,
      /** index repo/path/lang metadata as identity/tokenized shadow
        * fields so query-grammar operators (site:/repo:, inurl:/path:,
        * intitle:/file:, exacturl:, lang:) lower to index terms. */
      indexMeta: Boolean = false,
      /** index the flattened leaves of the optional `props` json column
        * as searchable terms (reference text_field.rs:1197-1240), so
        * `json:path=value` queries lower to must clauses like the meta
        * operators. */
      indexJson: Boolean = false,
      /** index each doc's RAKE keywords as whole-phrase terms of the
        * key_phrases shadow field (reference text_field.rs:1650-1688
        * newline-tokenizes webpage.keywords), so TopKeyPhrases serves
        * from the stored term dictionary instead of re-running RAKE. */
      indexKeyPhrases: Boolean = false,
      /** index each doc's outgoing-link targets (`SourceDoc.links`) as
        * identity terms of the Link shadow field, so `linksto:target`
        * lowers to a must clause (reference link fields + operator
        * lowering, plan/node.rs:128-172). */
      indexLinks: Boolean = false,
      /** classify each doc at build time and mark low-quality ones with
        * the Fields.QualityLowTerm marker term, so `safe:on` lowers to
        * a must-not over it — the safe-search analog (reference
        * query/mod.rs:110-118; no NSFW signal exists in a code corpus,
        * the quality gate stands in). */
      indexQuality: Boolean = false,
      /** persist the index-wide static-rank ordinal (GlobalRank) so
        * rankSignals serves CentralityRank from a keyed lookup instead
        * of its per-query counting pass — one extra narrow
        * doc-metadata range shuffle at build; same ranks either way. */
      storeGlobalRank: Boolean = false,
      /** Optional per-repo centrality scores (e.g. the output of
        * ops.Centrality.harmonicExact over a repo dependency graph),
        * broadcast into docid assignment: scored repos sort by
        * centrality (desc) with the fnv proxy as the within-repo
        * tie-break, so high-centrality repos get the SMALL docids the
        * ShortCircuit/static-rank machinery exploits — the Spark
        * analog of the reference's speedy-kv host-centrality lookup
        * feeding its precomputed score (ranking/computer/mod.rs:499-509).
        * Empty (default) = the deterministic fnv proxy, byte-identical
        * to every index built before this knob existed. */
      centrality: Map[String, Long] = Map.empty)

  final case class BuildReport(numDocs: Long, numTokens: Long,
                               segmentsBuilt: Int, segmentsSkipped: Int,
                               elapsedMs: Long)

  /** Internal union row so one pass writes every artifact kind. */
  final case class BuildRow(kind: String, segment: Int,
                            doc: Option[DocRow], posting: Option[PostingRow],
                            fnorm: Option[FnormRow], stat: Option[SegStatRow])

  /** Public: Spark codegen needs accessor visibility on encoder types. */
  final case class Tagged(segment: Int, sortKey: Long, repo: String,
                          path: String, commit: String, lang: String,
                          content: String, props: String = "",
                          links: Seq[String] = Seq.empty)

  /** FNV-1a 64-bit — stable across Spark/JVM versions, unlike
    * Murmur3-based Spark `hash()` which is only stable per version. */
  def fnv1a64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i) & 0xffffL
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Deterministic pseudo-centrality standing in for the reference's
    * query-independent precomputed score (ranking/computer/mod.rs:499-509;
    * the docid-order invariant of inverted_index/mod.rs:195-204). */
  def sortKeyOf(repo: String, path: String, commit: String): Long =
    fnv1a64(s"score:$repo/$path@$commit")

  def segmentOf(repo: String, path: String, numSegments: Int): Int = {
    val h = fnv1a64(repo + "|" + path)
    val m = (h % numSegments).toInt
    if (m < 0) m + numSegments else m
  }

  // JCA getInstance does provider lookup with shared-state contention —
  // at 32 threads it serializes the whole pipeline; thread-local reuse.
  private val shaLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("SHA-256")
  }
  private val HexChars = "0123456789abcdef".toCharArray

  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def sha256(s: String): Array[Byte] = {
    val md = shaLocal.get()
    md.reset()
    md.digest(s.getBytes("UTF-8"))
  }

  def sha256Hex(s: String): String = hex(sha256(s))

  // growable int buffer (avoids boxing in the hot accumulation path)
  private final class IntBuf(initial: Int = 8) {
    var arr = new Array[Int](initial)
    var n = 0
    def add(v: Int): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
      arr(n) = v; n += 1
    }
    def toArray: Array[Int] = java.util.Arrays.copyOf(arr, n)
  }

  private final class PostBuf {
    val docs = new IntBuf(4)
    val tfs = new IntBuf(4)
    // positions pre-encoded as vint gaps per doc (1 byte/token typical):
    // accumulating raw ints costs 4-8x the memory traffic and hits the
    // host's bandwidth wall at high thread counts
    var pos: graft.core.BlockCodec.ByteBuf = null
  }

  /** Segment-lifetime term accumulator: ONE open-addressing table maps
    * term -> posting buffer AND carries the per-doc state (count, last
    * position), so the hot loop allocates nothing for known terms — no
    * per-doc HashMap, no boxed counts, no token Strings on the ASCII
    * fast path (lookup folds (text,start,end) slices in place; a String
    * is materialized once per DISTINCT term per segment). Positions are
    * gap-vint-encoded inline at arrival (same byte format as before).
    * This is the allocation fix for the build's memory-bandwidth wall
    * at high thread counts (the reference's indexer writes into a
    * term-interned arena for the same reason, indexing.rs:38-39). */
  private final class TermTable(recordPositions: Boolean)
      extends graft.core.Tokenizers.TokenSink {
    private var cap = 1 << 12
    private var mask = cap - 1
    private var keys = new Array[String](cap)
    private var hashes = new Array[Int](cap)
    private var bufs = new Array[PostBuf](cap)
    private var cnts = new Array[Int](cap)
    private var lastPos = new Array[Int](cap)
    private var size = 0
    private val touched = new IntBuf(256)

    def numTerms: Int = size

    def clear(): Unit = {
      java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
      java.util.Arrays.fill(bufs.asInstanceOf[Array[AnyRef]], null)
      // cnts/lastPos are zeroed by endDoc; touched is drained there too
      size = 0
    }

    @inline private def fold(c: Char): Char = (c | 0x20).toChar

    private def grow(): Unit = {
      val oldKeys = keys; val oldHashes = hashes; val oldBufs = bufs
      val oldCnts = cnts; val oldLast = lastPos; val oldCap = cap
      cap <<= 1; mask = cap - 1
      keys = new Array[String](cap); hashes = new Array[Int](cap)
      bufs = new Array[PostBuf](cap); cnts = new Array[Int](cap)
      lastPos = new Array[Int](cap)
      var i = 0
      while (i < oldCap) {
        val k = oldKeys(i)
        if (k != null) {
          var idx = oldHashes(i) & mask
          while (keys(idx) != null) idx = (idx + 1) & mask
          keys(idx) = k; hashes(idx) = oldHashes(i); bufs(idx) = oldBufs(i)
          cnts(idx) = oldCnts(i); lastPos(idx) = oldLast(i)
        }
        i += 1
      }
      // remap touched slot ids (mid-doc growth)
      var t = 0
      while (t < touched.n) {
        val k = oldKeys(touched.arr(t))
        var idx = k.hashCode & mask
        while (keys(idx) ne k) idx = (idx + 1) & mask
        touched.arr(t) = idx
        t += 1
      }
    }

    @inline private def hit(idx: Int, pos: Int): Unit = {
      if (cnts(idx) == 0) { touched.add(idx); lastPos(idx) = 0 }
      cnts(idx) += 1
      if (recordPositions) {
        val pb = bufs(idx)
        if (pb.pos == null) pb.pos = new graft.core.BlockCodec.ByteBuf(8)
        var v = pos - lastPos(idx)
        lastPos(idx) = pos
        var done = false
        while (!done) {
          val b = v & 0x7f
          v >>>= 7
          if (v == 0) { pb.pos.write(b | 0x80); done = true } else pb.pos.write(b)
        }
      }
    }

    private def insert(idx: Int, key: String, h: Int, pos: Int): Unit = {
      keys(idx) = key; hashes(idx) = h; bufs(idx) = new PostBuf
      cnts(idx) = 0; lastPos(idx) = 0
      size += 1
      hit(idx, pos)
      if (size * 2 > cap) grow()
    }

    def asciiToken(text: String, start: Int, end: Int, pos: Int): Unit = {
      var h = 0
      var i = start
      while (i < end) { h = 31 * h + fold(text.charAt(i)); i += 1 }
      var idx = h & mask
      var k = keys(idx)
      while (k != null) {
        if (hashes(idx) == h && k.length == end - start) {
          var j = 0
          var eq = true
          while (eq && j < k.length) {
            if (k.charAt(j) != fold(text.charAt(start + j))) eq = false
            j += 1
          }
          if (eq) { hit(idx, pos); return }
        }
        idx = (idx + 1) & mask
        k = keys(idx)
      }
      val a = new Array[Char](end - start)
      var j = 0
      while (j < a.length) { a(j) = fold(text.charAt(start + j)); j += 1 }
      insert(idx, new String(a), h, pos)
    }

    def token(s: String, pos: Int): Unit = {
      val h = s.hashCode
      var idx = h & mask
      var k = keys(idx)
      while (k != null) {
        if (hashes(idx) == h && k.equals(s)) { hit(idx, pos); return }
        idx = (idx + 1) & mask
        k = keys(idx)
      }
      insert(idx, s, h, pos)
    }

    /** Close the current doc: append (docId, tf) per touched term. */
    def endDoc(docId: Int): Unit = {
      var i = 0
      while (i < touched.n) {
        val idx = touched.arr(i)
        val pb = bufs(idx)
        pb.docs.add(docId)
        pb.tfs.add(cnts(idx))
        cnts(idx) = 0
        i += 1
      }
      touched.n = 0
    }

    /** Sorted (term, buffer) snapshot — safe to keep after clear(). */
    def sortedEntries(): (Array[String], Array[PostBuf]) = {
      val terms = new Array[String](size)
      val out = new Array[PostBuf](size)
      var i = 0
      var o = 0
      while (i < cap) {
        if (keys(i) != null) { terms(o) = keys(i); o += 1 }
        i += 1
      }
      java.util.Arrays.sort(terms, java.util.Comparator.naturalOrder[String]())
      i = 0
      while (i < size) {
        val h = terms(i).hashCode
        var idx = h & mask
        while (!(keys(idx) eq terms(i)) && !(hashes(idx) == h && keys(idx).equals(terms(i))))
          idx = (idx + 1) & mask
        out(i) = bufs(idx)
        i += 1
      }
      (terms, out)
    }
  }

  def manifestDir(outDir: String) = s"$outDir/manifest"
  def dataDir(outDir: String) = s"$outDir/data"
  def stagingDir(outDir: String) = s"$outDir/staging"

  /** Batch commit marker: written last, checked first — the unit of
    * exactly-once. A batch whose marker exists is fully committed (data
    * adopted + manifests written); one without is re-staged from
    * scratch, and `adoptStaged` first deletes any partially-adopted
    * files of the same batch, so replay after a PROCESS crash at any
    * point (mid-stage, mid-adopt, mid-manifest) converges to exactly
    * one copy of the batch's rows. Durability caveat: the marker and
    * the adopted files are not fsynced, so an OS crash / power loss
    * can leave a durable marker over non-durable data — a filesystem-
    * level hazard shared with most local-FS commit protocols; on a
    * real deployment the data dir lives on a durable object store /
    * HDFS whose rename+close semantics provide the sync. */
  def batchMarkerPath(outDir: String, tag: String): java.nio.file.Path =
    java.nio.file.Paths.get(manifestDir(outDir), s"batch-$tag.done")

  def batchCommitted(outDir: String, tag: String): Boolean =
    java.nio.file.Files.exists(batchMarkerPath(outDir, tag))

  def commitBatch(outDir: String, tag: String, detail: String): Unit =
    java.nio.file.Files.writeString(batchMarkerPath(outDir, tag),
      s"""{"batch":"$tag",$detail}""")

  /** Move staged parquet files into the live data dir under
    * deterministic names `<prefix>-<j>.parquet`, deleting any previous
    * adoption of the same prefix first (idempotent on replay). Local-FS
    * rename here; a real cluster deploy uses the same protocol through
    * its object-store committer. */
  def adoptStaged(staged: String, outDir: String, prefix: String): Unit = {
    val stagedDir = new java.io.File(staged)
    val kinds = Option(stagedDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("kind="))
    // 1) clear any partial previous adoption of this batch
    val dd = new java.io.File(dataDir(outDir))
    if (dd.isDirectory) {
      dd.listFiles().filter(_.isDirectory).foreach { kd =>
        Option(kd.listFiles()).getOrElse(Array.empty)
          .filter(_.getName.startsWith(prefix + "-"))
          .foreach(_.delete())
      }
    }
    // 2) deterministic-name adopt
    kinds.foreach { kd =>
      val target = java.nio.file.Paths.get(dataDir(outDir), kd.getName)
      java.nio.file.Files.createDirectories(target)
      val parts = kd.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, j) =>
        java.nio.file.Files.move(f.toPath, target.resolve(s"$prefix-$j.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    deleteRecursively(stagedDir)
  }

  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  def build(spark: SparkSession, input: Dataset[SourceDoc], outDir: String,
            cfg: Config = Config()): BuildReport = {
    import spark.implicits._
    val t0 = System.nanoTime()
    new java.io.File(manifestDir(outDir)).mkdirs()
    val S = cfg.numSegments

    val bCent = spark.sparkContext.broadcast(cfg.centrality)
    val tagged = input.map { d =>
      val base = sortKeyOf(d.repo, d.path, d.commit)
      // centrality occupies the high bits, the fnv proxy's top 40 the
      // low bits (within-repo tie-break); un-scored repos keep only the
      // low bits and therefore sort below any repo with centrality >= 1.
      // Scores saturate at 2^23-1: the keys compare as SIGNED longs, so
      // a larger score shifted by 40 would set the sign bit and invert
      // the ordering for exactly the most central repos (harmonicExact
      // emits up to ~60 x reachable-nodes — a 140k-node in-ball would
      // overflow without the clamp; ordering among such mega-hubs
      // degrades to the tie-break, never inverts).
      val key =
        if (bCent.value.isEmpty) base
        else {
          val c = math.min(math.max(bCent.value.getOrElse(d.repo, 0L), 0L),
            (1L << 23) - 1)
          (c << 40) | (base >>> 24)
        }
      Tagged(segmentOf(d.repo, d.path, S), key,
        d.repo, d.path, d.commit, d.lang, d.content, d.props, d.links)
    }

    // batches are a STABLE grouping of all segments (independent of what
    // is already done) so the batch commit marker names stay meaningful
    // across resumes; an uncommitted batch is re-staged wholesale and
    // adoptStaged clears its partial files, so a crash between the data
    // append and the manifest write can never duplicate rows.
    // Each batch re-scans the input and filters to its segments — a
    // DELIBERATE trade: persisting the full tagged corpus to skip the
    // re-scans would materialize the entire (100 TB-class) input once,
    // which costs more than numBatches cheap columnar scans, and the
    // batching only engages when numSegments > segmentsPerBatch anyway
    // (single-batch builds scan once)
    var built = 0
    var skipped = 0
    (0 until S).grouped(cfg.segmentsPerBatch).zipWithIndex.foreach { case (batch, bi) =>
      val tag = s"b$bi"
      if (batchCommitted(outDir, tag)) { skipped += batch.size }
      else {
        val batchSet = batch.toSet
        val slice =
          if (batch.size == S) tagged
          else tagged.filter(t => batchSet.contains(t.segment))
        // over-partition well beyond the segment count: hash placement of S
        // segment keys into exactly S partitions leaves ~37% empty and some
        // with 3-4 segments (straggler waves); at 4x, surplus partitions are
        // cheap no-ops and the max per-task load stays ~1-2 segments.
        // DATA-driven, never cluster-size-driven: the partition count is a
        // property of the dataset (like files.maxPartitionBytes sizing), so
        // the same build is bit- and plan-identical at any executor count —
        // the north-rule N-vs-4N comparison must run the IDENTICAL job at
        // both levels (a cores-derived count was tried and distorted the
        // ratio by giving the small level a cheaper job).
        val parts = sys.env.get("GRAFT_BUILD_PARTS").map(_.toInt)
          .getOrElse(math.max(spark.sparkContext.defaultParallelism,
            math.min(batch.size * 4, 4096)))
        val staged = s"${stagingDir(outDir)}/$tag"
        val tw0 = System.nanoTime()
        writeSegments(slice, parts, staged, cfg)
        val ta0 = System.nanoTime()
        adoptStaged(staged, outDir, tag)
        val tr0 = System.nanoTime()

        // commit manifests for this batch (checkpoint + lineage)
        val stats = readStats(spark, outDir).filter(s => batchSet.contains(s.segment))
        if (sys.env.getOrElse("GRAFT_BUILD_TIMING", "0") == "1")
          println(f"GRAFT_TIMING write=${(ta0 - tw0) / 1e9}%.2f adopt=${(tr0 - ta0) / 1e9}%.2f stats=${(System.nanoTime() - tr0) / 1e9}%.2f")
        stats.foreach(writeManifest(outDir, _))
        // segments with zero input rows still need a manifest to be "done"
        val seen = stats.map(_.segment).toSet
        batch.filterNot(seen).foreach { seg =>
          writeManifest(outDir, SegStatRow(seg, 0, 0, 0, 0, "0" * 64, 0))
        }
        commitBatch(outDir, tag, s""""segments":${batch.size}""")
        built += batch.size
      }
    }

    val allStats = readStats(spark, outDir)
    // serving-tier global static-rank ordinal: derived data computed
    // AFTER the batch markers (a crash here just loses the derived
    // table; the index itself is already committed, and rankSignals
    // degrades to its counting pass until a re-run re-derives it).
    // Recompute-on-resume is idempotent overwrite.
    if (cfg.storeGlobalRank && allStats.exists(_.numDocs > 0))
      GlobalRank.write(spark, outDir)
    // skipped counts batch-marker skips only: segment manifests without
    // a batch marker (a crashed pre-marker run) are REBUILT, so they
    // must not report as skipped
    BuildReport(allStats.map(_.numDocs).sum, allStats.map(_.numTokens).sum,
      built, skipped, (System.nanoTime() - t0) / 1000000)
  }

  /** Stat rows of everything adopted so far. An EMPTY input writes no
    * parquet at all (partitionBy creates no kind= dirs), so the missing
    * path reads as zero rows instead of an AnalysisException — an empty
    * build is a valid BuildReport(0, 0, ...), and its batch markers
    * commit like any other (the resume contract assumes a stable input
    * across retries). */
  private def readStats(spark: SparkSession, outDir: String): Array[SegStatRow] = {
    import spark.implicits._
    val p = s"${dataDir(outDir)}/kind=stat"
    if (!new java.io.File(p).exists()) Array.empty
    else spark.read.parquet(p).select("stat.*").as[SegStatRow].collect()
  }

  /** Shared segment-build stage: shuffle to segments, sort, accumulate,
    * serialize, write parquet partitioned by row kind into
    * `<stageOut>/kind=*` (overwrite — callers stage then adopt, see
    * adoptStaged). Used by the batch build and the live (streaming)
    * micro-batch append. */
  def writeSegments(tagged: Dataset[Tagged], parts: Int, stageOut: String,
                    cfg: Config): Unit = {
    val maxShard = cfg.maxPostingsPerShard
    val fnChunk = cfg.fnormChunkSize
    val recordPos = cfg.recordPositions
    val stemmedF = cfg.indexStemmed
    val bigramF = cfg.indexBigrams
    val trigramF = cfg.indexTrigrams
    val simhashF = cfg.computeSimhash
    val metaF = cfg.indexMeta
    val jsonF = cfg.indexJson
    val keyPhrasesF = cfg.indexKeyPhrases
    val linksF = cfg.indexLinks
    val qualityF = cfg.indexQuality
    import tagged.sparkSession.implicits._
    tagged
      .repartition(parts, col("segment"))
      .sortWithinPartitions(col("segment"), col("sortKey").desc,
        col("repo"), col("path"), col("commit"))
      .mapPartitions { it =>
        new SegmentEmitter(it, maxShard, fnChunk, recordPos, stemmedF, bigramF,
          trigramF, simhashF, metaF, jsonF, keyPhrasesF, linksF, qualityF)
      }
      .write.mode(SaveMode.Overwrite).partitionBy("kind")
      .parquet(stageOut)
  }

  private def writeManifest(outDir: String, s: SegStatRow): Unit = {
    val json =
      s"""{"segment":${s.segment},"numDocs":${s.numDocs},"numTokens":${s.numTokens},
         |"numTerms":${s.numTerms},"numPostings":${s.numPostings},
         |"sha256Agg":"${s.sha256Agg}","buildMs":${s.buildMs}}""".stripMargin
    val p = java.nio.file.Paths.get(manifestDir(outDir), f"seg-${s.segment}%05d.json")
    java.nio.file.Files.writeString(p, json)
  }

  /** Streams a sorted partition, building one segment at a time fully
    * in RAM and flushing it as doc/fnorm/posting/stat rows. */
  private final class SegmentEmitter(it: Iterator[Tagged], maxShard: Int,
                                     fnChunk: Int, recordPositions: Boolean,
                                     indexStemmed: Boolean, indexBigrams: Boolean,
                                     indexTrigrams: Boolean,
                                     computeSimhash: Boolean,
                                     indexMeta: Boolean,
                                     indexJson: Boolean = false,
                                     indexKeyPhrases: Boolean = false,
                                     indexLinks: Boolean = false,
                                     indexQuality: Boolean = false)
      extends Iterator[BuildRow] {
    private var pending: Iterator[BuildRow] = Iterator.empty
    private var curSeg = -1
    private var t0 = 0L
    private var docs = new scala.collection.mutable.ArrayBuffer[DocRow]
    private var fnorms = new java.io.ByteArrayOutputStream()
    private var fnormsBigram = new java.io.ByteArrayOutputStream()
    private var fnormsTrigram = new java.io.ByteArrayOutputStream()
    private val table = new TermTable(recordPositions)
    private var numTokens = 0L
    // shadow-field token totals accumulate the CLAMPED per-doc counts
    // (max(nTok-1,0) / max(nTok-2,0)) so the segment average matches
    // the mean of the stored per-doc norms even when a segment holds
    // empty or one-token docs (segTokens - nDocs would go negative-ish
    // and diverge from the fnorm bytes it is paired with)
    private var bigramTokens = 0L
    private var trigramTokens = 0L
    private var shaAgg = new Array[Byte](32)

    // curSeg >= 0 means the current segment is accumulated but not yet
    // flushed — without that clause the final segment of a partition is
    // silently dropped whenever `pending` drains exactly at input end
    // (e.g. a 1-doc segment sorted after a larger one).
    def hasNext: Boolean = pending.hasNext || it.hasNext || curSeg >= 0

    def next(): BuildRow = {
      while (!pending.hasNext) {
        if (!it.hasNext) {
          if (curSeg >= 0) { pending = flush(); curSeg = -1 }
          else throw new NoSuchElementException
        } else {
          val t = it.next()
          if (t.segment != curSeg) {
            val f = if (curSeg >= 0) flush() else Iterator.empty
            reset(t.segment)
            addDoc(t)
            if (f.hasNext) pending = f
          } else addDoc(t)
        }
      }
      pending.next()
    }

    private def reset(seg: Int): Unit = {
      curSeg = seg
      t0 = System.nanoTime()
      docs = new scala.collection.mutable.ArrayBuffer[DocRow]
      fnorms = new java.io.ByteArrayOutputStream()
      fnormsBigram = new java.io.ByteArrayOutputStream()
      fnormsTrigram = new java.io.ByteArrayOutputStream()
      table.clear() // flush() snapshotted its entries; buffers survive
      numTokens = 0L
      bigramTokens = 0L
      trigramTokens = 0L
      shaAgg = new Array[Byte](32)
    }

    private def extraFnRows(seg: Int, field: Int, arr: Array[Byte],
                            nDocs: Int, chunk: Int): Iterator[BuildRow] =
      if (arr.isEmpty) Iterator.empty
      else (0 until nDocs by chunk).iterator.map { off =>
        val end = math.min(off + chunk, nDocs)
        BuildRow("fnorm", seg, None, None,
          Some(FnormRow(seg,
            (field << Fields.FnormFieldShift) | (off / chunk), end - off,
            java.util.Arrays.copyOfRange(arr, off, end))), None)
      }

    /** Visit every indexed (term, position) of a doc: the content field
      * plus the stemmed / bigram shadow fields (reference field
      * expansion: each field is its own term space). The stemmer is
      * selected per document language (reference
      * schema/text_field.rs:294-326; non-natural languages fall back to
      * English, so a source-code corpus is unaffected). */
    @inline private def forEachTerm(toks: Array[String], stem: String => String)
                                   (f: (String, Int) => Unit): Unit = {
      var p = 0
      while (p < toks.length) {
        f(toks(p), p)
        if (indexStemmed) f(Fields.StemPrefix + stem(toks(p)), p)
        if (indexBigrams && p + 1 < toks.length)
          f(Fields.bigramTerm(toks(p), toks(p + 1)), p)
        if (indexTrigrams && p + 2 < toks.length)
          f(Fields.trigramTerm(toks(p), toks(p + 1), toks(p + 2)), p)
        p += 1
      }
    }

    private def addDoc(t: Tagged): Unit = {
      val docId = docs.length
      // the TermTable carries per-doc counts + inline position encoding,
      // so the content-only configuration streams tokens with ZERO
      // allocation for known terms (no per-doc map, no token Strings on
      // the ASCII path); shadow fields need materialized tokens and go
      // through the same table via the default tokenizer
      var simhash = 0L
      val nTok =
        if (!indexStemmed && !indexBigrams && !indexTrigrams &&
            !computeSimhash && !indexQuality)
          Tokenizers.tokenizeInto(t.content, table)
        else {
          val toks = Tokenizers.default(t.content)
          val stem = graft.core.Stemmers.forLanguage(t.lang)
          forEachTerm(toks, stem)((term, p) => table.token(term, p))
          if (computeSimhash) simhash = graft.ops.Dedup.simhash64(toks)
          // build-time safe-search classification: flagged docs carry
          // the marker term `safe:on` must-nots (position 0, not
          // counted into content stats, like the meta fields)
          if (indexQuality && Fields.lowQuality(toks))
            table.token(Fields.QualityLowTerm, 0)
          toks.length
        }
      if (indexMeta) {
        // metadata shadow terms (positions meaningless: all at 0; these
        // fields never run phrases and do not count into content stats)
        table.token(Fields.repoTerm(t.repo), 0)
        table.token(Fields.langTerm(t.lang), 0)
        table.token(Fields.exactTerm(t.repo, t.path), 0)
        val pToks = Tokenizers.default(t.path)
        var pi = 0
        while (pi < pToks.length) { table.token(Fields.urlTerm(pToks(pi)), 0); pi += 1 }
        val base = t.path.substring(t.path.lastIndexOf('/') + 1)
        val bToks = Tokenizers.default(base)
        pi = 0
        while (pi < bToks.length) { table.token(Fields.titleTerm(bToks(pi)), 0); pi += 1 }
      }
      if (indexJson && t.props.nonEmpty) {
        // flattened json leaves as identity terms (positions at 0; not
        // counted into content stats, like the meta fields)
        Tokenizers.flattenJson(t.props)
          .foreach(tok => table.token(Fields.jsonTerm(tok), 0))
      }
      if (indexLinks && t.links.nonEmpty) {
        // outgoing-link targets as identity terms (positions at 0, not
        // counted into content stats, like the meta fields). Callers
        // pass DISTINCT targets; duplicates would bump tf and shift the
        // term's BM25 for no semantic reason.
        t.links.foreach(l => table.token(Fields.linkTerm(l), 0))
      }
      if (indexKeyPhrases) {
        // per-doc RAKE keywords, each whole phrase ONE term (reference
        // newline-tokenizes webpage.keywords into key_phrases); the
        // dictionary walk scores by doc_freq, so tf/positions are moot
        graft.core.Rake.keywords(t.content)
          .foreach(k => table.token(Fields.keyPhraseTerm(k.text), 0))
      }
      table.endDoc(docId)
      val fnId = FieldNorm.fieldNormToId(nTok.toLong)
      fnorms.write(fnId & 0xff)
      if (indexBigrams) {
        fnormsBigram.write(FieldNorm.fieldNormToId(math.max(nTok - 1, 0).toLong) & 0xff)
        bigramTokens += math.max(nTok - 1, 0)
      }
      if (indexTrigrams) {
        fnormsTrigram.write(FieldNorm.fieldNormToId(math.max(nTok - 2, 0).toLong) & 0xff)
        trigramTokens += math.max(nTok - 2, 0)
      }
      numTokens += nTok
      val sha = sha256(t.content)
      var i = 0
      while (i < 32) { shaAgg(i) = (shaAgg(i) ^ sha(i)).toByte; i += 1 }
      docs += DocRow(curSeg, docId, t.repo, t.path, t.commit, t.lang, hex(sha),
        nTok, fnId, t.sortKey, simhash)
    }

    private def flush(): Iterator[BuildRow] = {
      // capture everything locally: the emitted iterator is consumed
      // lazily after reset() repoints the mutable fields
      val seg = curSeg
      val segDocs = docs
      val (terms, termBufs) = table.sortedEntries()
      val segTokens = numTokens
      val segBigramTokens = bigramTokens
      val segTrigramTokens = trigramTokens
      val segShaHex = hex(shaAgg)
      val nDocs = segDocs.length
      val fnArr = fnorms.toByteArray
      val avgFn = if (nDocs == 0) 1.0f else segTokens.toFloat / nDocs.toFloat
      var totalPostings = 0L
      locally { var i = 0
        while (i < terms.length) { totalPostings += termBufs(i).docs.n; i += 1 } }
      val buildMs = (System.nanoTime() - t0) / 1000000

      val docRows = segDocs.iterator.map(d =>
        BuildRow("doc", seg, Some(d), None, None, None))
      val bigramFnArr = fnormsBigram.toByteArray
      val trigramFnArr = fnormsTrigram.toByteArray
      // Fields.Content == 0, so the shared chunker emits the content
      // rows with the same unshifted chunk ids the reader expects
      val fnRows = extraFnRows(seg, Fields.Content, fnArr, nDocs, fnChunk) ++
        extraFnRows(seg, Fields.Bigram, bigramFnArr, nDocs, fnChunk) ++
        extraFnRows(seg, Fields.Trigram, trigramFnArr, nDocs, fnChunk)
      val postRows = terms.indices.iterator.flatMap { ti =>
        val term = terms(ti)
        val pb = termBufs(ti)
        val df = pb.docs.n
        // shadow fields score against their own fieldnorms + averages
        val field = Fields.fieldOf(term)
        val termAvg =
          if (field == Fields.Bigram && nDocs > 0)
            math.max(segBigramTokens, 1L).toFloat / nDocs.toFloat
          else if (field == Fields.Trigram && nDocs > 0)
            math.max(segTrigramTokens, 1L).toFloat / nDocs.toFloat
          else avgFn
        val termFn = Fields.fnormFieldOf(field) match {
          case Fields.Bigram => bigramFnArr
          case Fields.Trigram => trigramFnArr
          case _ => fnArr
        }
        val w = Bm25Weight.forTerm(df.toLong, nDocs.toLong, termAvg)
        val dArr = pb.docs.toArray
        val tArr = pb.tfs.toArray
        val pEnc = if (pb.pos == null) null else pb.pos.toByteArray
        if (df <= maxShard) {
          val pl = PostingListData.buildEncoded(term, dArr, tArr, w, termFn, pEnc)
          Iterator.single(BuildRow("posting", seg, None,
            Some(PostingRow.from(seg, 0, 0, pl)), None, None))
        } else {
          // hot-term sharding: bound row size and per-task query memory;
          // per-doc byte offsets in the encoded position stream let each
          // shard slice without decoding
          val docByteOff: Array[Int] =
            if (pEnc == null) null
            else {
              val o = new Array[Int](df + 1)
              var pos = 0
              var i = 0
              while (i < df) {
                o(i) = pos
                var j = 0
                while (j < tArr(i)) {
                  while ((pEnc(pos) & 0x80) == 0) pos += 1
                  pos += 1
                  j += 1
                }
                i += 1
              }
              o(df) = pos
              o
            }
          (0 until df by maxShard).iterator.zipWithIndex.map { case (off, sh) =>
            val end = math.min(off + maxShard, df)
            val pSlice = if (pEnc == null) null
              else java.util.Arrays.copyOfRange(pEnc, docByteOff(off), docByteOff(end))
            val pl = PostingListData.buildEncoded(term,
              java.util.Arrays.copyOfRange(dArr, off, end),
              java.util.Arrays.copyOfRange(tArr, off, end), w, termFn, pSlice)
            BuildRow("posting", seg, None,
              Some(PostingRow.from(seg, sh, 0, pl)), None, None)
          }
        }
      }
      val statRow = Iterator.single(
        BuildRow("stat", seg, None, None, None,
          Some(SegStatRow(seg, nDocs.toLong, segTokens, terms.length.toLong,
            totalPostings, segShaHex, buildMs))))
      docRows ++ fnRows ++ postRows ++ statRow
    }
  }
}
