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

/** The fx64 twin (`embedder.rs:103-108`): fxhash64 over UTF-8 bytes with the
  * trailing 0xff, masked to the engine's non-negative carrier exactly like
  * `graft.bm25.Fx64Hasher` — so a columnar pipeline using this expression
  * lands in the same term space as an index built with the fx64 hasher.
  */
case class FxHash64Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fxhash64 requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    FxHash.hash64Bytes(bytes) & Long.MaxValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hashFn = FxHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
    defineCodeGen(ctx, ev, c =>
      s"($hashFn.hash64Bytes(($c).getBytes()) & Long.MAX_VALUE)")
  }

  override protected def withNewChildInternal(newChild: Expression): FxHash64Expr =
    copy(child = newChild)

  override def prettyName: String = "fxhash64"
}

object functions {
  /** Registers the engine's native expressions with the session (SQL names
    * `fxhash32`/`fxhash64`, usable from spark.sql and `call_function`).
    */
  def registerAll(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fxhash32", exprs => FxHash32Expr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fxhash64", exprs => FxHash64Expr(exprs.head), "scala_udf")
  }

  /** Column form: `fxhash32($"token")` — the embedding-space index (E1).
    * Requires `registerAll(spark)` once per session.
    */
  def fxhash32(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fxhash32", c)

  /** Column form: `fxhash64($"token")` — the u64 embedding space, masked to
    * the engine's non-negative carrier (matches `Fx64Hasher`).
    */
  def fxhash64(c: Column): Column =
    org.apache.spark.sql.functions.call_function("fxhash64", c)
}
