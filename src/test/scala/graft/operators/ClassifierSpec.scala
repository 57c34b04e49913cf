package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Learning contract of [[Classifier]] (C37): the distributed
  * gradient-descent trainer must actually learn (planted separable
  * vocabularies → high accuracy), empty docs must score neutral, and
  * scoring under FIXED weights must be deterministic — the properties
  * that stand in for a SQL oracle, which distributed float summation
  * rules out for the trained weights themselves. */
class ClassifierSpec extends SparkSpec {

  private val posWords = Seq("clear", "prose", "reads", "well", "cited",
    "source", "veri", "facts")
  private val negWords = Seq("zz1", "zz2", "zz3", "buy", "click", "spamx",
    "xx7", "xx9")

  /** 240 docs, fully separable vocabularies, deterministic contents. */
  private def corpus() = {
    import spark.implicits._
    (0 until 240).map { i =>
      val pos = i % 2 == 0
      val vocab = if (pos) posWords else negWords
      val text = (0 until 30).map(j => vocab((i * 7 + j) % vocab.size))
        .mkString(" ")
      (i.toLong, text, if (pos) 1 else 0)
    }.toDF("doc_id", "text", "label")
  }

  test("learns planted separable labels to >= 95% accuracy") {
    val d = corpus()
    val w = Classifier.train(spark, d, "doc_id", "text", "label",
      dim = 128, iters = 10, lr = 2.0)
    assert(w.exists(_ != 0.0), "weights must move off zero")
    val scored = Classifier.score(d, "doc_id", "text", w)
      .select(col("doc_id"), col("label"), col("prob"))
    val rows = scored.collect()
    assert(rows.length == 240)
    val acc = rows.count(r =>
      (r.getDouble(2) >= 0.5) == (r.getInt(1) == 1)).toDouble / rows.length
    assert(acc >= 0.95, s"accuracy $acc")
    // separation, not just threshold luck
    val posMean = rows.filter(_.getInt(1) == 1).map(_.getDouble(2)).sum / 120
    val negMean = rows.filter(_.getInt(1) == 0).map(_.getDouble(2)).sum / 120
    assert(posMean > 0.7 && negMean < 0.3, s"pos=$posMean neg=$negMean")
  }

  test("empty and null texts score neutral 0.5; featurize emits no rows for them") {
    import spark.implicits._
    val d = corpus()
    val w = Classifier.train(spark, d, "doc_id", "text", "label",
      dim = 128, iters = 4, lr = 2.0)
    val odd = Seq((9000L, ""), (9001L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(Classifier.featurize(odd, "doc_id", "text", 128).count() == 0)
    val scored = Classifier.score(odd, "doc_id", "text", w).collect()
    assert(scored.length == 2)
    scored.foreach(r => assert(r.getAs[Double]("prob") == 0.5))
  }

  test("score survives idCol named 'id' and a pre-existing 'id' column") {
    import spark.implicits._
    val w = Array.tabulate(128)(i => (i % 7 - 3) * 0.1)
    val renamed = corpus().withColumnRenamed("doc_id", "id")
    assert(Classifier.score(renamed, "id", "text", w).count() == 240)
    val withExtra = corpus().withColumn("extra", col("doc_id") * 2)
    val out = Classifier.score(withExtra, "doc_id", "text", w)
    assert(out.columns.count(_ == "prob") == 1 &&
      out.columns.contains("extra") && out.count() == 240)
  }

  test("scoring under fixed weights is deterministic") {
    val d = corpus()
    val w = Array.tabulate(128)(i => (i % 7 - 3) * 0.1)
    def run() = Classifier.score(d, "doc_id", "text", w)
      .select(col("doc_id"), round(col("prob"), 10).as("p"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).sortBy(_._1).toSeq
    assert(run() == run())
  }

  test("portable integer perceptron separates the planted vocabularies exactly") {
    val d = corpus()
    val w = Classifier.trainPortable(spark, d, "doc_id", "text", "label",
      iters = 4)
    assert(w.nonEmpty && w.values.exists(_ != 0L), "weights must move off zero")
    assert(w.keys.forall(b => b.length == 2 && b.forall(c =>
      c.isDigit || ('a' to 'f').contains(c))), s"buckets must be md5 hex pairs: ${w.keys}")
    val rows = Classifier.scorePortable(d, "doc_id", "text", w).collect()
    assert(rows.length == 240)
    val labels = d.select("doc_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // fully separable integer problem: the perceptron must be EXACT
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(2) == (labels(id) == 1),
        s"doc $id margin=${r.getLong(1)} pred=${r.getBoolean(2)} label=${labels(id)}")
    }
  }

  test("portable trainer is bit-deterministic; empty docs score margin 0, pred false") {
    import spark.implicits._
    val d = corpus()
    def fit() = Classifier.trainPortable(spark, d, "doc_id", "text", "label",
      iters = 4)
    val w = fit()
    assert(w == fit(), "integer training must replay bit-identically")
    val odd = Seq((9000L, ""), (9001L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val scored = Classifier.scorePortable(odd, "doc_id", "text", w).collect()
    assert(scored.length == 2)
    scored.foreach { r =>
      assert(r.getLong(1) == 0L && !r.getBoolean(2), r.toString)
    }
  }
}
