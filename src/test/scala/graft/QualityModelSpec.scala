package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

/** Trained quality classifier ([[graft.operators.QualityModel]]).
  *
  * Gates: the distributed gradient fold tracks the sequential
  * reference trainer within float tolerance (double sums are
  * partition-order-sensitive, so bit equality is not claimed); the
  * classifier separates a synthetically separable corpus; training
  * reduces log-loss on the real fixture.
  */
class QualityModelSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"
  private implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def docsDf(rows: Seq[(Long, String, Int)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "label")
  }

  test("distributed training == sequential reference within tolerance") {
    val rnd = new scala.util.Random(0x9a11)
    val rows = (0L until 80L).map { i =>
      val good = i % 2 == 0
      val vocabWords = if (good) Seq("clean", "prose", "fluent", "the", "of")
        else Seq("zzz", "spamspam", "xxxx", "garbage", "noise")
      val text = Seq.fill(20 + rnd.nextInt(30))(
        vocabWords(rnd.nextInt(vocabWords.length))).mkString(" ")
      (i, text, if (good) 1 else 0)
    }
    val docs = docsDf(rows)
    val dim = 64
    val dist = QualityModel.train(docs, "label", dim = dim, iters = 10)
    val ref = QualityModel.referenceTrain(
      QualityModel.featurizeDump(docs, "label", dim), dim, iters = 10,
      lr = dist.lr, l2 = dist.l2)
    assert(math.abs(dist.bias - ref.bias) < 1e-9)
    val maxDiff = dist.weights.zip(ref.weights).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff < 1e-9, s"max weight diff $maxDiff")
  }

  test("classifier separates a synthetically separable corpus (accuracy >= 0.95)") {
    val rnd = new scala.util.Random(0x51e9)
    val rows = (0L until 200L).map { i =>
      val good = i % 2 == 0
      val vocabWords = if (good) Seq("alpha", "beta", "gamma", "delta")
        else Seq("omega", "sigma", "kappa", "lambda")
      val text = Seq.fill(15 + rnd.nextInt(20))(
        vocabWords(rnd.nextInt(vocabWords.length))).mkString(" ")
      (i, text, if (good) 1 else 0)
    }
    val docs = docsDf(rows)
    val model = QualityModel.train(docs, "label", dim = 128, iters = 30)
    val c = QualityModel.confusion(docs, "label", model).head()
    val (tp, fp, tn, fn) = (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    assert(tp + fp + tn + fn == 200L)
    val acc = (tp + tn).toDouble / 200.0
    assert(acc >= 0.95, s"accuracy $acc; confusion tp=$tp fp=$fp tn=$tn fn=$fn")
  }

  test("training reduces log-loss on the fixture corpus, and beats majority-class accuracy") {
    val docs = graft.sources.Tables.documents(spark, sfDir).withColumn("label",
      (graft.functions.TextFunctions.qualityScore(col("text")) >= 0.4).cast("int"))
    val zero = QualityModel.Model(1024, Array.fill(1024)(0.0), 0.0, 2.0, 1e-4, 0)
    val before = QualityModel.logLoss(docs, "label", zero)
    val model = QualityModel.train(docs, "label")
    val after = QualityModel.logLoss(docs, "label", model)
    assert(after < before, s"log-loss did not drop: $before -> $after")
    val c = QualityModel.confusion(docs, "label", model).head()
    val (tp, fp, tn, fn) = (c.getLong(0), c.getLong(1), c.getLong(2), c.getLong(3))
    val n = (tp + fp + tn + fn).toDouble
    val acc = (tp + tn) / n
    val majority = math.max(tp + fn, tn + fp) / n // best constant classifier
    assert(acc > majority,
      s"accuracy $acc does not beat majority baseline $majority")
  }

  test("hash-sampled mini-batch SGD (batches=4) still separates the separable corpus") {
    val rnd = new scala.util.Random(0x3b47)
    val rows = (0L until 200L).map { i =>
      val good = i % 2 == 0
      val vocabWords = if (good) Seq("alpha", "beta", "gamma", "delta")
        else Seq("omega", "sigma", "kappa", "lambda")
      val text = Seq.fill(15 + rnd.nextInt(20))(
        vocabWords(rnd.nextInt(vocabWords.length))).mkString(" ")
      (i, text, if (good) 1 else 0)
    }
    val docs = docsDf(rows)
    // same iteration budget as full-batch but each pass scans ~1/4 of
    // the corpus — the 100 TB shape; must still converge
    val model = QualityModel.train(docs, "label", dim = 128, iters = 32, batches = 4)
    val c = QualityModel.confusion(docs, "label", model).head()
    val acc = (c.getLong(0) + c.getLong(2)).toDouble / 200.0
    assert(acc >= 0.95, s"mini-batch accuracy $acc")
  }

  test("qualityFilterIngest: streamed admits == batch-scored admits (zero drift)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val train = docsDf((0L until 60L).map { i =>
      val good = i % 2 == 0
      val t = if (good) "alpha beta gamma delta alpha beta gamma"
        else "omega sigma kappa lambda omega sigma kappa"
      (i, t, if (good) 1 else 0)
    })
    val model = QualityModel.train(train, "label", dim = 64, iters = 25)
    val b0 = Seq(100L -> "alpha beta gamma alpha delta beta",
      101L -> "omega sigma kappa omega lambda sigma")
    val b1 = Seq(102L -> "gamma delta alpha beta gamma delta",
      103L -> "kappa lambda omega sigma kappa lambda")
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest.qualityFilterIngest(
      mem.toDF().toDF("doc_id", "text"), model) { batch =>
      admitted.synchronized { admitted ++= batch.collect().map(_.getLong(0)) }
    }.start()
    try {
      mem.addData(b0: _*); q.processAllAvailable()
      mem.addData(b1: _*); q.processAllAvailable()
    } finally q.stop()
    val batchAdmits = docsDf((b0 ++ b1).map { case (i, t) => (i, t, 0) })
      .filter(QualityModel.score(col("text"), model) >= 0.5)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(admitted.sorted.toSeq == batchAdmits)
    // and the separable batches actually split (not vacuous)
    assert(batchAdmits == Seq(100L, 102L))
  }

  test("score is a pure scan-stage column: no exchange in the scoring plan") {
    val model = QualityModel.Model(64, Array.fill(64)(0.1), -0.5, 2.0, 1e-4, 0)
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val plan = docs.select(QualityModel.score(col("text"), model).as("p"))
      .queryExecution.executedPlan.toString
    // scope the tripwire to the LIVE plan: the cached base table's
    // stored build lineage (printed below InMemoryTableScan /
    // InMemoryRelation) legitimately contains the one-time cache-spread
    // repartition exchange (Tables.spreadForCache) — scoring must add
    // no shuffle of its own ABOVE the cache scan
    val livePlan = plan.split("InMemoryTableScan")(0)
    assert(!livePlan.contains("Exchange"), s"scoring plan shuffles:\n$plan")
  }
}
