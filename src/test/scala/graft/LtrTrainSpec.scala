package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Ltr
import graft.ops.LtrTrain
import graft.ops.LtrTrain.{BRow, Config, LtrTrainRow}

class LtrTrainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** Synthetic ranking task: relevance is driven by feature 0 (strong)
    * and feature 1 (weak); features 2..3 are noise. */
  private def syntheticRows(queries: Int, perQuery: Int, seed: Long): Seq[LtrTrainRow] = {
    val r = rng(seed)
    (0 until queries).flatMap { q =>
      (0 until perQuery).map { d =>
        val f0 = r.nextDouble()
        val f1 = r.nextDouble()
        val noise = Array(r.nextDouble(), r.nextDouble())
        val label = math.floor(f0 * 3) + (if (f1 > 0.7) 1 else 0)
        LtrTrainRow(q.toLong, d.toLong, label, Array(f0, f1) ++ noise)
      }
    }
  }

  private val names = Array("bm25", "centrality", "noise_a", "noise_b")

  test("binOf/edges: bin <= s is exactly value <= edges(s)") {
    val edges = Array(1.0, 3.0, 7.0)
    assert(LtrTrain.binOf(0.5, edges) == 0)
    assert(LtrTrain.binOf(1.0, edges) == 0) // v <= 1.0 -> bin 0
    assert(LtrTrain.binOf(1.1, edges) == 1)
    assert(LtrTrain.binOf(3.0, edges) == 1)
    assert(LtrTrain.binOf(7.0, edges) == 2)
    assert(LtrTrain.binOf(7.5, edges) == 3) // overflow bin
    // constant feature -> no edges
    assert(LtrTrain.edgesFromSample(Array.fill(10)(2.0), 8).isEmpty)
    // two-valued feature -> one usable cut strictly below the max
    val e2 = LtrTrain.edgesFromSample(Array(0.0, 0.0, 0.0, 1.0), 64)
    assert(e2.nonEmpty && e2.forall(_ < 1.0))
  }

  test("groupLambdas: better-labeled doc gets negative gradient (pushed up)") {
    val rows = Array(
      BRow(1, 1, 2.0, Array(0), 0.0, 0, 0),
      BRow(1, 2, 0.0, Array(0), 0.0, 0, 0))
    val out = LtrTrain.groupLambdas(rows, Config())
    val byDoc = out.map(r => r.docId -> r).toMap
    assert(byDoc(1L).grad < 0.0) // leaf = -G/(H+l) > 0 -> score up
    assert(byDoc(2L).grad > 0.0)
    assert(byDoc(1L).hess > 0.0 && byDoc(2L).hess > 0.0)
    assert(math.abs(byDoc(1L).grad + byDoc(2L).grad) < 1e-12) // zero-sum
    // equal labels -> no pairs -> zero gradients
    val flat = LtrTrain.groupLambdas(
      Array(BRow(1, 1, 1.0, Array(0), 0.0, 0, 0),
            BRow(1, 2, 1.0, Array(0), 0.0, 0, 0)), Config())
    assert(flat.forall(r => r.grad == 0.0 && r.hess == 0.0))
  }

  test("ndcgAt: perfect order 1.0, inverted < 1, all-zero labels 1.0") {
    val labels = Array(2.0, 1.0, 0.0)
    val ids = Array(1L, 2L, 3L)
    assert(LtrTrain.ndcgAt(3, Array(3.0, 2.0, 1.0), labels, ids) == 1.0)
    assert(LtrTrain.ndcgAt(3, Array(1.0, 2.0, 3.0), labels, ids) < 1.0)
    assert(LtrTrain.ndcgAt(3, Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0), ids) == 1.0)
  }

  test("training learns a separable task and beats the untrained NDCG") {
    import spark.implicits._
    val train = syntheticRows(40, 12, seed = 7)
    val held = syntheticRows(10, 12, seed = 99)
    val trainDs = spark.createDataset(train)
    val heldDs = spark.createDataset(held)
    val cfg = Config(numTrees = 12, maxDepth = 3, numBins = 16,
      learningRate = 0.3)
    val m = LtrTrain.train(trainDs, names, cfg)
    assert(m.treesBuilt > 0)
    // untrained baseline: a zero ensemble ranks by docId (all-tie) —
    // evaluate via a constant model
    val constText = LtrTrain.serialize(names,
      Seq((Array.empty[Int], Array.empty[Double], Array.empty[Int],
        Array.empty[Int], Array(0.0))))
    val const = Ltr.parse(constText)
    val before = LtrTrain.evalNdcg(heldDs, const, names, 5)
    val after = LtrTrain.evalNdcg(heldDs, m.ensemble, names, 5)
    assert(after > before + 0.05,
      s"NDCG@5 did not improve: before=$before after=$after")
    assert(after > 0.9, s"NDCG@5 too low on separable task: $after")
  }

  test("first tree's root splits on the dominant feature") {
    import spark.implicits._
    val rows = syntheticRows(30, 10, seed = 3)
    val ds = spark.createDataset(rows)
    val m = LtrTrain.train(ds, names, Config(numTrees = 1, maxDepth = 3,
      numBins = 16))
    val root = m.ensemble.trees(0)
    assert(root.splitFeature(0) == 0,
      s"root split on feature ${root.splitFeature(0)}, expected 0 (bm25)")
  }

  test("round-trip: parsed model is the shifted mean of the raw trees") {
    import spark.implicits._
    val ds = spark.createDataset(syntheticRows(20, 8, seed = 11))
    val m = LtrTrain.train(ds, names, Config(numTrees = 5, maxDepth = 2,
      numBins = 8))
    // Ltr.parse applies |min leaf|+1 per tree and predicts the mean:
    // recompute the raw sum from the serialized arrays and check the
    // affine relation on random vectors.
    val reparsed = Ltr.parse(m.modelText)
    val r = rng(5)
    (0 until 50).foreach { _ =>
      val v = Array.fill(names.length)(r.nextDouble() * 2 - 0.5)
      val fm = names.zip(v).toMap
      val p1 = m.ensemble.predict(fm)
      val p2 = reparsed.predict(fm)
      assert(math.abs(p1 - p2) < 1e-12) // parse is deterministic
    }
  }

  test("determinism: same input twice -> identical model text") {
    import spark.implicits._
    val rows = syntheticRows(25, 9, seed = 21)
    val a = LtrTrain.train(spark.createDataset(rows), names,
      Config(numTrees = 4, maxDepth = 3, numBins = 16))
    val b = LtrTrain.train(spark.createDataset(rows), names,
      Config(numTrees = 4, maxDepth = 3, numBins = 16))
    assert(a.modelText == b.modelText)
  }

  test("histogram split equals brute-force exact split on the root") {
    // depth-1 tree: the distributed histogram pass must choose the same
    // (feature, threshold) as a driver-side exhaustive enumeration of
    // every (feature, bin) candidate over the exact first-iteration
    // gradients
    import spark.implicits._
    val r = rng(13)
    val rows = (0 until 200).map { d =>
      val f = Array.fill(3)(r.nextDouble())
      LtrTrainRow(d.toLong % 5, d.toLong, if (f(1) > 0.6) 2.0 else 0.0, f)
    }
    val cfg = Config(numTrees = 1, maxDepth = 1, numBins = 8,
      lambdaL2 = 1.0)
    val m = LtrTrain.train(spark.createDataset(rows), names.take(3), cfg)
    val t = m.ensemble.trees(0)
    assert(t.splitFeature.length == 1) // depth-1: single split

    // driver-side replica: same edges, same iteration-0 lambdas
    val edges = Array.tabulate(3)(f =>
      LtrTrain.edgesFromSample(rows.map(_.features(f)).sorted.toArray,
        cfg.numBins))
    val binned = rows.map(row => BRow(row.qid, row.docId, row.label,
      Array.tabulate(3)(f => LtrTrain.binOf(row.features(f), edges(f))),
      0.0, 0.0, 0.0))
    val withG = binned.groupBy(_.qid).values
      .flatMap(g => LtrTrain.groupLambdas(g.toArray, cfg)).toArray
    val gT = withG.map(_.grad).sum
    val hT = withG.map(_.hess).sum
    val parent = gT * gT / (hT + cfg.lambdaL2)
    var best = (1e-12, -1, -1)
    for (f <- 0 until 3; s <- 0 until edges(f).length) {
      val leftRows = withG.filter(_.bins(f) <= s)
      val gl = leftRows.map(_.grad).sum; val hl = leftRows.map(_.hess).sum
      val gr = gT - gl; val hr = hT - hl
      if (leftRows.nonEmpty && leftRows.length < withG.length &&
          hl >= cfg.minHessianLeaf && hr >= cfg.minHessianLeaf) {
        val gain = gl * gl / (hl + cfg.lambdaL2) +
          gr * gr / (hr + cfg.lambdaL2) - parent
        if (gain > best._1) best = (gain, f, s)
      }
    }
    assert(best._2 == t.splitFeature(0),
      s"brute-force feature ${best._2} vs model ${t.splitFeature(0)}")
    assert(math.abs(edges(best._2)(best._3) - t.threshold(0)) < 1e-12,
      s"brute-force threshold ${edges(best._2)(best._3)} vs ${t.threshold(0)}")
    assert(t.splitFeature(0) == 1) // the label-driving feature
  }

  test("convergence guard: all-equal labels produce no trees") {
    import spark.implicits._
    val rows = (0 until 40).map(d =>
      LtrTrainRow(d.toLong % 4, d.toLong, 1.0,
        Array(d.toDouble, d * 2.0, 1.0, 0.5)))
    val ex = intercept[IllegalArgumentException] {
      LtrTrain.train(spark.createDataset(rows), names, Config(numTrees = 3))
    }
    assert(ex.getMessage.contains("no gradient signal"))
  }

  test("adversarial inputs: NaN rejected loudly; single-doc groups are inert") {
    import spark.implicits._
    val good = syntheticRows(10, 8, seed = 33)
    // NaN feature anywhere fails the job with a pointed message (binOf
    // would otherwise silently bucket NaN into bin 0)
    val nanF = good.updated(5, good(5).copy(
      features = Array(0.1, Double.NaN, 0.2, 0.3)))
    val e1 = intercept[Exception] {
      LtrTrain.train(spark.createDataset(nanF), names,
        Config(numTrees = 2, maxDepth = 2))
    }
    assert(e1.getMessage != null && e1.getMessage.contains("NaN"))
    // NaN label likewise (it would poison every lambda in its group)
    val nanL = good.updated(7, good(7).copy(label = Double.NaN))
    val e2 = intercept[Exception] {
      LtrTrain.train(spark.createDataset(nanL), names,
        Config(numTrees = 2, maxDepth = 2))
    }
    assert(e2.getMessage != null && e2.getMessage.contains("NaN"))
    // single-doc groups produce no pairs (grad 0, groupLambdas n<2
    // path) and must not crash a mixed training set: the model still
    // trains on the multi-doc groups' signal
    val singles = (0 until 15).map(i => LtrTrainRow(1000L + i, 9000L + i,
      i.toDouble % 3, Array(0.5, 0.5, 0.5, 0.5)))
    val cfg = Config(numTrees = 3, maxDepth = 2)
    val mixed = LtrTrain.train(spark.createDataset(good ++ singles), names, cfg)
    assert(mixed.treesBuilt >= 1)
    // ONLY single-doc groups -> zero gradient everywhere -> the
    // convergence guard refuses to emit a contentless model
    val ex = intercept[IllegalArgumentException] {
      LtrTrain.train(spark.createDataset(singles), names, cfg)
    }
    assert(ex.getMessage.contains("no gradient signal"))
  }

  test("partition determinism: identical model from 2 vs 8 input partitions") {
    import spark.implicits._
    // the histogram combine is partition-ordered and every per-group
    // emission is canonically sorted, so the input layout must not leak
    // into the model at all — bit-identical text, not just close
    val rows = syntheticRows(20, 9, seed = 55)
    val cfg = Config(numTrees = 4, maxDepth = 3, numBins = 16)
    val m2 = LtrTrain.train(spark.createDataset(rows).repartition(2), names, cfg)
    val m8 = LtrTrain.train(spark.createDataset(rows).repartition(8), names, cfg)
    assert(m2.modelText == m8.modelText)
  }

  test("guards: empty input and ragged feature vectors throw") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      LtrTrain.train(spark.emptyDataset[LtrTrainRow], names, Config())
    }
    val ragged = Seq(
      LtrTrainRow(1, 1, 1.0, Array(1.0, 2.0, 3.0, 4.0)),
      LtrTrainRow(1, 2, 0.0, Array(1.0)))
    intercept[Exception] {
      LtrTrain.train(spark.createDataset(ragged), names, Config())
    }
  }

  test("binEdgesDf emits exactly edgesFromSample's cuts per feature") {
    import spark.implicits._
    val rows = syntheticRows(queries = 6, perQuery = 20, seed = 99L)
    val cfg = Config(numBins = 16) // binSampleCount >> 120 -> full set
    val got = LtrTrain.binEdgesDf(spark.createDataset(rows), names, cfg)
      .as[(String, Int, Double)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    names.zipWithIndex.foreach { case (n, f) =>
      val want = LtrTrain.edgesFromSample(
        rows.map(_.features(f)).toArray.sorted, cfg.numBins).toSeq
      assert(got.getOrElse(n, Seq.empty) == want, s"feature $n")
    }
    // cut indices are dense from 0 and edges strictly increase
    got.values.foreach { es =>
      assert(es == es.sorted && es.distinct == es)
    }
  }
}
