package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.store.SparkTestSession

/** Distributed logistic-regression quality classifier (t28): descent,
  * partitioning-independence, and planted-separability semantics. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("t28 gate: loss starts at ln 2 and decreases; accuracy ends high") {
    val rows = QualityModel.t28QualityClassifier(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == QualityModel.NumIters)
    // iteration 1 scores the w=0 model: loss = ln 2
    assert(math.abs(rows.head._2 - math.log(2.0)) < 1e-6)
    // full-batch GD with a stable step: strictly decreasing loss
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 < a._2, s"loss rose: $a -> $b")
    }
    // the rule label must be genuinely learned, not majority-guessed:
    // the pass-rate base line sits near 0.86, the model near 0.94
    assert(rows.last._3 >= 0.9, s"final accuracy ${rows.last._3}")
  }

  test("training is bit-identical under repartitioning") {
    val feat = QualityModel.features(spark, dir)
    val (m1, t1) = QualityModel.train(feat.repartition(3))
    val (m2, t2) = QualityModel.train(feat.repartition(17))
    assert(m1.w.toSeq == m2.w.toSeq)
    assert(m1.mu.toSeq == m2.mu.toSeq && m1.sd.toSeq == m2.sd.toSeq)
    assert(t1 == t2)
  }

  test("planted separable label: learned weight points at the feature") {
    import spark.implicits._
    // y == 1 exactly when x3 is high; other features are constant
    val feat = (0 until 200).map { i =>
      val hi = i % 2 == 0
      (i.toLong, if (hi) 1.0 else 0.0, 1.0, 0.5, 0.5, if (hi) 0.9 else 0.1, 0.5)
    }.toDF("doc_id", "y", "x0", "x1", "x2", "x3", "x4")
    val (m, trace) = QualityModel.train(feat, iters = 30)
    assert(m.w(3) > 0.0, s"x3 weight ${m.w(3)}")
    // perfectly separable: accuracy reaches 1.0
    assert(trace.last._2 == 1.0, s"final accuracy ${trace.last._2}")
  }
}
