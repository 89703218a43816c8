package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}

/** Semi-codegen for the hand-rolled kernel expressions (r13 verdict
  * #4, carried from r12): the per-row LOOP was never the problem — it
  * is the same tight JVM loop under codegen or fallback — but
  * `CodegenFallback` pays two per-row taxes around it: (1) the whole
  * child subtree re-evaluates INTERPRETED (a fallback node's doGenCode
  * materializes an InternalRow and calls `eval`, so upstream column
  * reads go through boxed BoundReference paths instead of the
  * generated accessors), and (2) the surrounding operators lose their
  * WholeStageCodegen span boundaries around the projection. These
  * traits keep the children inside generated code — the kernel input
  * arrives as an already-evaluated local variable — and spend ONE
  * virtual call per row on the kernel body, which delegates to the
  * exact same `nullSafeEval` the interpreted path runs (bit-identical
  * semantics by construction; the specs that pin each kernel against
  * its HOF formulation hold for both paths).
  *
  * The null contract matches `BinaryExpression`/`UnaryExpression`
  * `eval`: any null child short-circuits to null (nullSafeCodeGen
  * generates that), and a null RESULT from the kernel (ragged input,
  * empty candidate set) sets the output null explicitly. */
private[functions] object KernelCodegen {
  /** Cast the kernel's boxed Object result back to the slot's codegen
    * type — EXPLICIT unboxing for primitive slots (janino's
    * autoboxing support is not something to lean on). */
  def castResult(tmp: String, dt: org.apache.spark.sql.types.DataType): String = {
    val boxed = CodeGenerator.boxedType(dt)
    if (CodeGenerator.isPrimitiveType(dt))
      s"(($boxed) $tmp).${CodeGenerator.javaType(dt)}Value()"
    else s"($boxed) $tmp"
  }
}

trait UnaryKernelCodegen extends UnaryExpression {

  /** Every kernel here can return null for a NON-null input (ragged
    * vector, empty candidate set, geometry mismatch), so the slot must
    * be declared nullable regardless of the child — also the reason
    * the generated glue may assign `ev.isNull`: with `nullable =
    * child.nullable` a non-nullable child makes nullSafeCodeGen emit
    * `isNull` as the literal `false`, the assignment fails janino
    * ("not an rvalue"), and every affected stage silently falls back
    * to interpreted — measured as a 2.8× wall on the ×64 embed_dedup
    * arm before this override. */
  override def nullable: Boolean = true

  /** Public bridge for generated code — same body the interpreter
    * runs. */
  final def compute(input: Any): Any = nullSafeEval(input)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("kernelRes")
      s"""
         |Object $tmp = $ref.compute($c);
         |${ev.isNull} = ($tmp == null);
         |if (!${ev.isNull}) {
         |  ${ev.value} = ${KernelCodegen.castResult(tmp, dataType)};
         |}
       """.stripMargin
    })
  }
}

/** Binary-arity twin of [[UnaryKernelCodegen]]. */
trait BinaryKernelCodegen extends BinaryExpression {

  /** See [[UnaryKernelCodegen.nullable]] — null results exist for
    * non-null inputs, and the literal-false isNull slot would break
    * the generated assignment. */
  override def nullable: Boolean = true

  final def compute(l: Any, r: Any): Any = nullSafeEval(l, r)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("kernel", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val tmp = ctx.freshName("kernelRes")
      s"""
         |Object $tmp = $ref.compute($l, $r);
         |${ev.isNull} = ($tmp == null);
         |if (!${ev.isNull}) {
         |  ${ev.value} = ${KernelCodegen.castResult(tmp, dataType)};
         |}
       """.stripMargin
    })
  }
}
