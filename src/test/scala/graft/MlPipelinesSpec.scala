package graft

import org.apache.spark.ml.linalg.Vector
import graft.ml.MlPipelines

class MlPipelinesSpec extends SparkTestBase {
  import spark.implicits._

  test("tfidf: IDF values on a 3-doc micro corpus match ln((n+1)/(df+1))") {
    val docs = Seq((0L, "alpha beta"), (1L, "alpha gamma"), (2L, "alpha delta"))
      .toDF("doc_id", "text")
    val (model, transformed) = MlPipelines.tfidf(docs, numFeatures = 1 << 18)
    assert(transformed.count() == 3)
    val idfModel = model.stages.last.asInstanceOf[org.apache.spark.ml.feature.IDFModel]
    // idf is dense over all buckets: unseen buckets carry ln((3+1)/(0+1)),
    // alpha (df=3) -> ln(4/4)=0, beta/gamma/delta (df=1) -> ln(4/2).
    val counts = idfModel.idf.toArray.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts.count { case (v, _) => math.abs(v - math.log(2.0)) < 1e-12 } == 1)
    assert(counts.find { case (v, _) => math.abs(v - math.log(2.0)) < 1e-12 }.get._2 == 3)
    assert(counts.getOrElse(0.0, 0) == 1)
  }

  test("tfidf is deterministic across runs") {
    val docs = Tables.load(spark, SF, "documents").limit(50)
    val v1 = MlPipelines.tfidf(docs)._2.select("doc_id", "tfidf").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    val v2 = MlPipelines.tfidf(docs)._2.select("doc_id", "tfidf").collect()
      .map(r => r.getLong(0) -> r.getAs[Vector](1)).toMap
    assert(v1 == v2)
  }

  test("customer feature prep: one-hot(5 segments) + acctbal = 5-dim vector") {
    val out = MlPipelines.customerFeatures(Tables.load(spark, SF, "customer"))
    val v = out.select("features").head().getAs[Vector](0)
    assert(v.size == 5) // 4 one-hot (dropLast) + 1 numeric
    assert(out.count() == Tables.load(spark, SF, "customer").count())
  }

  test("seeded kmeans partitions embeddings into k clusters") {
    val (model, preds) = MlPipelines.kmeansEmbeddings(spark, SF, k = 10)
    assert(model.clusterCenters.length == 10)
    val clusters = preds.select("prediction").distinct().count()
    assert(clusters > 1 && clusters <= 10)
    assert(preds.count() == Tables.load(spark, SF, "embeddings").count())
    assert(model.summary.trainingCost > 0 && !model.summary.trainingCost.isNaN)
  }

  test("lang classification pipeline trains and evaluates") {
    val (model, acc) = MlPipelines.langClassifier(spark, SF)
    // corpus vocabulary is shared across langs (verified) — the classifier
    // can't beat the majority class by much; floor = better-than-nothing.
    assert(acc >= 0.15 && acc <= 1.0, s"accuracy $acc")
    assert(model.stages.length == 6)
  }

  test("fitted pipeline persistence: save/load round-trip transforms identically") {
    // model persistence is a first-class MLlib user capability (train
    // once on the cluster, serve elsewhere): the reloaded PipelineModel
    // must reproduce the original's predictions exactly, stage for stage
    val (model, _) = MlPipelines.langClassifier(spark, SF)
    val dir = java.nio.file.Files.createTempDirectory("graft-mlpersist")
      .resolve("langclf").toString
    model.write.overwrite().save(dir)
    val reloaded = org.apache.spark.ml.PipelineModel.load(dir)
    assert(reloaded.stages.length == model.stages.length)
    val docs = Tables.load(spark, SF, "documents").limit(100)
    val a = model.transform(docs)
      .select("doc_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = reloaded.transform(docs)
      .select("doc_id", "prediction").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b, "reloaded model predictions diverged")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("ALS trains on synthesized purchase ratings") {
    val rmse = MlPipelines.alsPurchases(spark, SF)
    assert(rmse >= 0 && !rmse.isNaN && !rmse.isInfinite)
  }

  test("decision tree and naive bayes train to sane accuracies") {
    val dt = MlPipelines.decisionTreeEmbeddings(spark, SF)
    assert(dt >= 0.0 && dt <= 1.0)
    val nb = MlPipelines.naiveBayesLang(spark, SF)
    assert(nb >= 0.2 && nb <= 1.0, s"NB train accuracy $nb below majority-class floor")
  }

  test("fitted pipeline model survives a save/load roundtrip") {
    import org.apache.spark.ml.PipelineModel
    val docs = Tables.load(spark, SF, "documents")
    val (model, _) = MlPipelines.tfidf(docs)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    model.write.overwrite().save(dir)
    val reloaded = PipelineModel.load(dir)
    // identical stage lineup and identical transform output
    assert(reloaded.stages.map(_.getClass.getName).toSeq ==
      model.stages.map(_.getClass.getName).toSeq)
    val a = model.transform(docs).select("doc_id", "tfidf").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    val b = reloaded.transform(docs).select("doc_id", "tfidf").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    assert(a == b, "reloaded model transforms differently")
  }

  test("random forest trains to an accuracy comparable to the single tree") {
    val rf = MlPipelines.randomForestEmbeddings(spark, SF)
    val dt = MlPipelines.decisionTreeEmbeddings(spark, SF)
    assert(rf >= 0.0 && rf <= 1.0)
    // feature-subset randomness means the ensemble may trail the single
    // all-features tree slightly on TRAIN accuracy; bound the gap
    assert(rf >= dt - 0.05, s"rf $rf far below dt $dt")
  }

  test("GBT trains a binary classifier above the parity-label majority floor") {
    val gbt = MlPipelines.gbtEmbeddings(spark, SF)
    // label%2 is near-balanced, so majority-class is ~0.5; boosted trees on
    // the training set must beat it clearly
    assert(gbt >= 0.6 && gbt <= 1.0, s"GBT train accuracy $gbt")
  }

  test("OneVsRest multiclass reduction is comparable to direct multinomial logreg") {
    val ovr = MlPipelines.oneVsRestEmbeddings(spark, SF)
    assert(ovr >= 0.0 && ovr <= 1.0)
    // k independent binary fits should land near the direct multiclass
    // tree baseline on the same features
    val dt = MlPipelines.decisionTreeEmbeddings(spark, SF)
    assert(ovr >= dt - 0.3, s"OvR $ovr implausibly far below tree $dt")
  }

  test("FPGrowth finds frequent itemsets with support-consistent counts") {
    import org.apache.spark.sql.functions._
    val sets = MlPipelines.fpGrowthBaskets(spark, SF, minSupport = 0.02)
    val n = sets.count()
    assert(n > 0, "no frequent itemsets at 2% support")
    val baskets = Tables.load(spark, SF, "lineitem")
      .select(col("l_orderkey")).distinct().count()
    // every reported itemset must meet the support threshold
    val minFreq = sets.agg(min("freq")).head().getLong(0)
    assert(minFreq >= math.ceil(0.02 * baskets).toLong - 1, s"minFreq $minFreq of $baskets baskets")
    // anti-monotonicity: a singleton superset count never exceeds the singleton's
    val freqs = sets.collect().map(r => r.getSeq[Long](0).toSet -> r.getLong(1)).toMap
    freqs.filter(_._1.size == 2).foreach { case (pair, f) =>
      pair.subsets(1).foreach { sub =>
        freqs.get(sub).foreach(fs => assert(f <= fs, s"$pair freq $f > subset $sub freq $fs"))
      }
    }
  }

  test("linear regression recovers known coefficients on a linear target") {
    val (r2, qtyCoef) = MlPipelines.linearRegressionLineitem(spark, SF)
    assert(r2 > 0.999, s"r2 $r2")
    assert(math.abs(qtyCoef - 100.0) < 0.5, s"qty coefficient $qtyCoef")
  }

  test("PCA projects to k dims with decreasing explained variance") {
    val (dim, ev) = MlPipelines.pcaEmbeddings(spark, SF, k = 8)
    assert(dim == 8)
    assert(ev.length == 8)
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("word2vec fits a seeded embedding table") {
    val (vocab, dim) = MlPipelines.word2vecDocs(spark, SF)
    assert(vocab > 10 && dim == 16)
  }

  test("LDA fits seeded topics with real vocabulary terms") {
    val (k, vocab, topics) = ml.MlPipelines.ldaDocs(spark, SF, k = 5)
    assert(k == 5 && vocab > 20)
    assert(topics.length == 5)
    topics.foreach { t =>
      assert(t.length == 5)
      t.foreach(i => assert(i >= 0 && i < vocab))
    }
  }

  test("correlation matrix matches SQL corr within 1e-6") {
    val m = MlPipelines.correlationMatrix(spark, SF)
    assert(m.numRows == 3 && m.numCols == 3)
    (0 until 3).foreach(i => assert(math.abs(m(i, i) - 1.0) < 1e-12))
    val sqlCorr = Tables.load(spark, SF, "lineitem")
      .agg(org.apache.spark.sql.functions.corr("l_quantity", "l_extendedprice"))
      .head().getDouble(0)
    assert(math.abs(m(0, 1) - sqlCorr) < 1e-6)
  }

  test("cross-validated grid orders metrics sanely") {
    val (best, worst) = MlPipelines.crossValidatedLangClassifier(spark, SF)
    assert(best >= worst)
    assert(best >= 0.0 && best <= 1.0)
  }
}
