package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityFilter

/** The trained quality filter: in-engine logistic regression over hashed
  * token features. The contract under test: it LEARNS (separable planted
  * vocab → high train accuracy), it is DETERMINISTIC (decimal-sum
  * gradients → bit-identical weights under any partitioning), and it
  * degrades safely (empty text, degenerate labels).
  */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  /** Planted separable corpus: positives draw from vocab A + shared noise,
    * negatives from vocab B + shared noise. Deterministic (seeded).
    */
  private def planted = {
    val rnd = new scala.util.Random(3)
    val vocabA = Seq("lucid", "coherent", "thorough", "precise", "insight")
    val vocabB = Seq("spam", "clickbait", "scam", "junk", "noise")
    val shared = Seq("the", "a", "of", "and", "text", "words", "common")
    val rows = (0 until 200).map { i =>
      val pos = i % 2 == 0
      val own = if (pos) vocabA else vocabB
      val toks = (0 until 20).map { _ =>
        if (rnd.nextDouble() < 0.4) own(rnd.nextInt(own.size))
        else shared(rnd.nextInt(shared.size))
      }
      (i.toLong, toks.mkString(" "), if (pos) 1 else 0)
    }
    rows.toDF("doc_id", "text", "label")
  }

  test("learns a separable planted vocabulary to >=95% train accuracy") {
    val docs = planted
    val w = QualityFilter.train(docs, "doc_id", "text", "label",
      dim = 1 << 12, iters = 20)
    assert(w.length === (1 << 12) + 1)
    val scored = QualityFilter.score(docs, "doc_id", "text", w)
      .join(docs.select(col("doc_id"), col("label")), "doc_id")
    val acc = scored
      .withColumn("__hit", ((col("score") >= 0.5) === (col("label") === 1)).cast("int"))
      .agg(avg(col("__hit"))).head().getDouble(0)
    assert(acc >= 0.95, s"train accuracy $acc")
    // scores are probabilities
    val mm = scored.agg(min("score"), max("score")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("training is bit-deterministic under repartitioning (decimal-sum gradients)") {
    val docs = planted
    val w1 = QualityFilter.train(docs, "doc_id", "text", "label",
      dim = 1 << 10, iters = 8)
    val w2 = QualityFilter.train(docs.repartition(13), "doc_id", "text", "label",
      dim = 1 << 10, iters = 8)
    assert(w1.toSeq === w2.toSeq,
      "weights must be identical regardless of partitioning")
  }

  test("degenerate shapes: empty text scores via bias; single-label corpus trains") {
    val docs = Seq((1L, "", 1), (2L, "some words", 0), (3L, "more words", 1))
      .toDF("doc_id", "text", "label")
    val w = QualityFilter.train(docs, "doc_id", "text", "label",
      dim = 256, iters = 3)
    val s = QualityFilter.score(docs, "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s.size === 3 && s.values.forall(v => v >= 0.0 && v <= 1.0))
    // all-one-label: converges toward predicting 1 everywhere, no crash
    val ones = Seq((1L, "alpha beta", 1), (2L, "gamma delta", 1))
      .toDF("doc_id", "text", "label")
    val w1 = QualityFilter.train(ones, "doc_id", "text", "label",
      dim = 64, iters = 10)
    val s1 = QualityFilter.score(ones, "doc_id", "text", w1)
      .collect().map(_.getDouble(1))
    assert(s1.forall(_ > 0.5))
    // guards
    intercept[IllegalArgumentException] {
      QualityFilter.train(docs, "doc_id", "text", "label", dim = 1 << 20)
    }
    intercept[IllegalArgumentException] {
      QualityFilter.train(docs.limit(0), "doc_id", "text", "label", dim = 64)
    }
  }
}
