package graft

import org.apache.spark.sql.functions._
import graft.functions.{Kernels, PqKernels}
import graft.ml.Pq

/** The semi-codegen kernel traits (r14, verdict r13 #4):
  * [[graft.functions.UnaryKernelCodegen]]/[[graft.functions.BinaryKernelCodegen]]
  * keep the kernel expressions INSIDE whole-stage codegen (children
  * evaluate generated; one `compute` call per row) instead of
  * `CodegenFallback` (InternalRow materialization + interpreted child
  * subtree per row). Two pins:
  *   1. the generated code really calls the kernel's `compute` bridge
  *     (a silent janino failure would fall back to interpreted and the
  *     win would evaporate without failing anything);
  *   2. codegen and interpreted paths return IDENTICAL results — the
  *     bridge delegates to the same `nullSafeEval`, and this proves no
  *     null-slot or cast bug crept into the generated glue. */
class KernelCodegenSpec extends GraftSpec {

  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").limit(400)

  private def generated(df: org.apache.spark.sql.DataFrame): String =
    org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)

  test("kernel compute calls appear in the generated code (no silent fallback)") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 0)
    // plain scan → project chain: the shape WholeStageCodegen owns (a
    // broadcast nested-loop crossJoin would suppress WSCG regardless
    // of the expressions and prove nothing about the kernels)
    val cands = typedLit(Seq((1L, (1 to 64).map(_.toDouble))))
      .cast("array<struct<list_id:bigint,cvec:array<double>>>")
    val df = emb
      .select(col("embedding"),
        Kernels.cosineSim(col("embedding"), col("embedding")).as("cos"),
        Kernels.bestCosine(col("embedding"), cands).as("best"),
        Kernels.cosineLshBands(col("embedding"), 4, 6, 42L).as("lsh"),
        PqKernels.pqCodes(col("embedding"), model.codebook,
          model.m, model.k, model.subDim).as("codes"),
        PqKernels.pqTable(col("embedding"), model.codebook,
          model.m, model.k, model.subDim).as("table"),
        Kernels.bucketIdx(element_at(col("embedding"), 1).cast("double"),
          Array(-1.0, 0.0, 0.5)).as("bkt"))
      .select(col("cos"), col("best"), col("lsh"), col("bkt"),
        PqKernels.pqResidualCodes(col("embedding"), col("embedding"),
          model.codebook, model.m, model.k, model.subDim).as("rcodes"),
        PqKernels.pqAdcScore(col("codes"), col("table"), model.k).as("adc"))
    val code = generated(df)
    assert(code.contains("WholeStageCodegen"),
      s"no WSCG subtree at all — plan shape broke the pin:\n$code")
    Seq("CosineSimExpr", "BestCosineExpr", "CosineLshBandsExpr",
      "PqCodesExpr", "PqResidualCodesExpr", "PqTableExpr",
      "PqAdcScoreExpr", "BucketIdxExpr").foreach { cls =>
      assert(code.contains(s"graft.functions.$cls") && code.contains(".compute("),
        s"$cls not wired through generated code — fallback regressed:\n" +
          code.linesIterator.filter(_.contains("graft")).mkString("\n"))
    }
    assert(df.count() == 400)
  }

  test("non-nullable children compile (the literal-false isNull slot)") {
    // The first codegen cut broke EXACTLY here: with `nullable =
    // child.nullable`, a non-nullable child (literals, NOT-NULL
    // columns) made nullSafeCodeGen emit `isNull` as the literal
    // `false`, the glue's assignment failed janino ("not an rvalue"),
    // and every affected stage silently fell back to interpreted —
    // a 2.8× wall on the ×64 embed_dedup arm that no test caught.
    // codegen.fallback=false turns that silent fallback into a FAILURE.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 0)
      val vec = typedLit((1 to 64).map(_.toFloat)) // non-nullable literal child
      val df = emb.select(
        Kernels.cosineSim(vec, vec).as("cos"),
        Kernels.cosineLshBands(vec, 4, 6, 42L).as("lsh"),
        Kernels.bestCosine(vec, typedLit(Seq((1L, (1 to 64).map(_.toDouble))))
          .cast("array<struct<list_id:bigint,cvec:array<double>>>")).as("best"),
        PqKernels.pqCodes(vec, model.codebook, model.m, model.k,
          model.subDim).as("codes"),
        PqKernels.pqResidualCodes(vec, vec, model.codebook, model.m, model.k,
          model.subDim).as("rcodes"),
        PqKernels.pqTable(vec, model.codebook, model.m, model.k,
          model.subDim).as("table"))
        .select(col("cos"), col("lsh"), col("best"), col("rcodes"),
          PqKernels.pqAdcScore(col("codes"), col("table"), model.k).as("adc"))
      assert(df.count() == 400)
      assert(df.head().getDouble(4) != 0.0) // adc over a real table
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("codegen and interpreted paths return identical results (incl. residual codes)") {
    val model = Pq.train(emb, "vec_id", "embedding", m = 8, k = 16, iters = 1)
    val cents = graft.ml.Similarity.centroids(emb, "vec_id", "embedding", nLists = 4)
    val resModel = Pq.trainResidual(emb, "vec_id", "embedding", cents,
      m = 8, k = 16, iters = 1)
    def run(): Seq[String] = {
      val assigned = graft.ml.Similarity.assignLists(emb, "vec_id", "embedding", cents)
      val df = Pq.encodeResidual(assigned, "embedding", resModel, cents)
        .withColumn("raw_codes", PqKernels.pqCodes(col("embedding"),
          model.codebook, model.m, model.k, model.subDim))
        .withColumn("cos", Kernels.cosineSim(col("embedding"), col("embedding")))
        .withColumn("lsh", Kernels.cosineLshBands(col("embedding"), 4, 6, 42L))
        .select(col("vec_id"), hex(col("pq_codes")), hex(col("raw_codes")),
          round(col("cos"), 9), col("lsh").cast("array<string>"))
      df.collect().map(_.toSeq.map(String.valueOf(_)).mkString("|")).sorted.toSeq
    }
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(gen == interp,
      s"codegen vs interpreted diverged: ${gen.diff(interp).take(3)}")
    assert(gen.size == 400)
  }
}
