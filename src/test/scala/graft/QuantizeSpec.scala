package graft

import org.apache.spark.sql.functions._

import graft.ops.Quantize

/** int8 embedding quantization: bounded codes, tight reconstruction. */
class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 round trip: codes bounded, reconstruction within scale/2") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(100)(Seq.fill(16)((rnd.nextGaussian() * 3).toFloat))
    val df = rows.toDF("embedding")
    val out = df.select(col("embedding"),
        Quantize.int8Scale(col("embedding")).as("scale"),
        Quantize.quantizeInt8(col("embedding")).as("codes"))
      .withColumn("recon", Quantize.dequantizeInt8(col("codes"), col("scale")))
      .collect()
    out.foreach { r =>
      val emb = r.getSeq[Float](0)
      val scale = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      val recon = r.getSeq[Double](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(codes.exists(c => math.abs(c) === 127)) // max component saturates
      emb.zip(recon).foreach { case (x, xr) =>
        assert(math.abs(x.toDouble - xr) <= scale / 2 + 1e-12,
          s"err ${math.abs(x.toDouble - xr)} > half-scale ${scale / 2}")
      }
    }
  }

  test("int8CosineTopK keeps recall ≥ 0.8 vs float brute force on clustered data") {
    import graft.ops.Similarity
    val rnd = new scala.util.Random(5)
    val centers = Seq.fill(10)(Array.fill(16)(rnd.nextGaussian()))
    val rows = for { (c, ci) <- centers.zipWithIndex; j <- 0 until 30 }
      yield (ci.toLong * 30 + j,
        c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    val emb = rows.toDF("vec_id", "embedding")
    val query = emb.filter(col("vec_id") === 0).select("embedding")
    val rest = emb.filter(col("vec_id") =!= 0)
    val exact = Similarity.cosineTopK(rest, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val int8 = Quantize.int8CosineTopK(rest, query, "vec_id", "embedding", 10)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(int8).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=$exact int8=$int8")
  }

  test("zero vector quantizes to zero codes with zero scale") {
    val r = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .select(Quantize.int8Scale(col("embedding")),
        Quantize.quantizeInt8(col("embedding"))).head()
    assert(r.getDouble(0) === 0.0)
    assert(r.getSeq[Int](1).forall(_ === 0))
  }

  test("randomProject equals the driver-side integer reference exactly") {
    val rnd = new scala.util.Random(9)
    val vecs = (0L until 50L).map(i => (i, Seq.fill(16)(rnd.nextFloat() * 2 - 1)))
    val signs = Quantize.projectionSigns(inDim = 16, outDim = 4, seed = 7L)
    def ref(v: Seq[Float]): Seq[Long] = {
      // HALF_UP on the shortest decimal repr — Spark round(double) semantics
      // (math.round would differ on negative exact halves)
      val q = v.map(x => java.math.BigDecimal.valueOf(x.toDouble * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact)
      signs.toSeq.map(row => row.zip(q).map { case (s, x) => s * x }.sum)
    }
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"), Quantize.randomProject(col("embedding"), signs).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    vecs.foreach { case (id, v) => assert(got(id) === ref(v), s"vec $id") }
  }

  test("projectionSigns is a pure function of (inDim, outDim, seed)") {
    val a = Quantize.projectionSigns(64, 8, 42L)
    val b = Quantize.projectionSigns(64, 8, 42L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.length === 8 && a.forall(_.length === 64))
    assert(a.flatten.forall(s => s == 1 || s == -1))
    // seed actually matters
    val c = Quantize.projectionSigns(64, 8, 43L)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
  }
}
