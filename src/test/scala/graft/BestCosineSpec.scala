package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BestCosineExpr pinned against the HOF formulation it replaced
  * (`array_max(transform(cs, c => struct(cosine(v, cvec), list_id)))`)
  * — same argmax, same tie/NaN/null-sim artifacts, on randomized and
  * adversarial inputs. The kernel exists for speed (interpreted HOF →
  * one tight loop; see the scaladoc), so equality IS the contract. */
class BestCosineSpec extends GraftSpec {

  import spark.implicits._

  private def hof(vecCol: String): org.apache.spark.sql.Column =
    array_max(transform(col("cs"), c =>
      struct(graft.ml.Similarity.cosine(col(vecCol), c.getField("cvec")).as("sim"),
        c.getField("list_id").as("list_id"))))

  private def both(rows: DataFrame): DataFrame =
    rows.agg(collect_list(struct(col("list_id"), col("cvec"))).as("cs"))

  test("kernel equals the HOF argmax on random candidate sets") {
    val rnd = new scala.util.Random(42)
    val cands = (0L until 37L).map(i =>
      (i, Seq.fill(16)(rnd.nextDouble() * 2 - 1))).toDF("list_id", "cvec")
    val cs = both(cands)
    val probes = (0 until 25).map(_ => Seq.fill(16)(rnd.nextDouble() * 2 - 1))
      .toDF("v").crossJoin(cs)
    val out = probes.select(
      graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"),
      hof("v").as("h")).collect()
    out.foreach { r =>
      val k = r.getStruct(0); val h = r.getStruct(1)
      assert(k.getLong(0) == h.getLong(1), s"argmax id diverged: $k vs $h")
      assert(math.abs(k.getDouble(1) - h.getDouble(0)) < 1e-12)
    }
  }

  test("tie on sim picks the larger list_id (struct max ordering)") {
    // two identical candidate vectors — cosine ties exactly
    val cands = Seq((3L, Seq(1.0, 0.0)), (9L, Seq(1.0, 0.0)), (5L, Seq(0.0, 1.0)))
      .toDF("list_id", "cvec")
    val row = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v").crossJoin(both(cands))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"),
        hof("v").as("h")).collect()(0)
    assert(row.getStruct(0).getLong(0) == 9L)
    assert(row.getStruct(1).getLong(1) == 9L)
  }

  test("NaN sim sorts greatest, matching Spark's double ordering") {
    // zero candidate vector → 0/0 = NaN cosine; array_max puts NaN on top
    val cands = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)))
      .toDF("list_id", "cvec")
    val row = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v").crossJoin(both(cands))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"),
        hof("v").as("h")).collect()(0)
    assert(row.getStruct(0).getLong(0) == row.getStruct(1).getLong(1))
    assert(row.getStruct(0).getDouble(1).isNaN)
  }

  test("all-null-sim candidates yield (max list_id, null sim); empty yields null") {
    val cands = Seq((4L, null.asInstanceOf[Seq[Double]]),
      (7L, null.asInstanceOf[Seq[Double]])).toDF("list_id", "cvec")
    val row = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v").crossJoin(both(cands))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"),
        hof("v").as("h")).collect()(0)
    assert(row.getStruct(0).getLong(0) == 7L && row.getStruct(0).isNullAt(1))
    assert(row.getStruct(1).getLong(1) == 7L && row.getStruct(1).isNullAt(0))
    val empty = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v")
      .withColumn("cs", array().cast("array<struct<list_id:bigint,cvec:array<double>>>"))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"))
      .collect()(0)
    assert(empty.isNullAt(0))
  }

  test("null input vector returns null (the one documented divergence)") {
    val cands = Seq((1L, Seq(1.0, 0.0))).toDF("list_id", "cvec")
    val row = Seq(Tuple1(null.asInstanceOf[Seq[Double]])).toDF("v")
      .crossJoin(both(cands))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"))
      .collect()(0)
    assert(row.isNullAt(0))
  }

  test("float corpus vectors against double centroids (the ingest shape)") {
    val cands = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))).toDF("list_id", "cvec")
    val row = Seq(Tuple1(Seq(0.1f, 0.9f))).toDF("v").crossJoin(both(cands))
      .select(graft.functions.Kernels.bestCosine(col("v"), col("cs")).as("k"),
        hof("v").as("h")).collect()(0)
    assert(row.getStruct(0).getLong(0) == 1L)
    assert(row.getStruct(0).getLong(0) == row.getStruct(1).getLong(1))
  }

  test("misuse fails at analysis, not mid-task") {
    val df = Seq(Tuple1("nope")).toDF("v")
      .withColumn("cs", array(struct(lit(1L).as("list_id"), array(lit(1.0)).as("cvec"))))
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft.functions.Kernels.bestCosine(col("v"), col("cs"))).collect()
    }
  }
}
