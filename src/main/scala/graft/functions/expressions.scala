package graft.functions

import graft.text.FxHash
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's token hash
  * (`/root/reference/src/embedder.rs:96-101`, fxhash32 over UTF-8 bytes with
  * the trailing 0xff of Rust's `str::hash`): returns the u32 result widened
  * to a non-negative Long. Codegen-friendly (participates in whole-stage
  * codegen; no UDF serialization) — use in columnar pipelines like the
  * token→term dictionary joins; the fused tokenize+embed typed map keeps
  * using graft.text.FxHash directly.
  */
case class FxHash32Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fxhash32 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    FxHash.hash32Bytes(bytes) & 0xffffffffL
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hashFn = FxHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"($hashFn.hash32Bytes(($c).getBytes()) & 0xffffffffL)")
  }

  override protected def withNewChildInternal(newChild: Expression): FxHash32Expr =
    copy(child = newChild)

  override def prettyName: String = "fxhash32"
}

object functions {
  /** Registers the engine's native expressions with the session (SQL name
    * `fxhash32`, usable from spark.sql and `call_function`).
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fxhash32", exprs => FxHash32Expr(exprs.head), "scala_udf")
  }

  /** Column form: `fxhash32($"token")` — the embedding-space index (E1).
    * Requires `registerAll(spark)` once per session.
    */
  def fxhash32(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fxhash32", c)
}
