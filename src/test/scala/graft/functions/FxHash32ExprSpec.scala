package graft.functions

import graft.SparkTestBase
import graft.text.FxHash

class FxHash32ExprSpec extends SparkTestBase {
  import spark.implicits._

  test("fxhash32 expression matches the scalar port (codegen path)") {
    functions.registerAll(spark)
    val words = Seq("tea", "cup", "Cup", "of", "space", "station", "étude", "")
    val got = words.toDF("w")
      .select($"w", functions.fxhash32($"w").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === FxHash.hash32u(w), s"mismatch for '$w'")
    }
    assert(got("tea") === 415655421L) // reference README vector
  }

  test("fxhash32 stays inside whole-stage codegen") {
    functions.registerAll(spark)
    // non-foldable input (a local Seq constant-folds into a LocalTableScan)
    val df = spark.range(4).selectExpr("cast(id as string) as w")
      .select(functions.fxhash32($"w").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark WholeStageCodegen stages in the compact plan form
    assert(plan.contains("*(1) Project [fxhash32"), s"expected codegen:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq ===
      (0 until 4).map(i => FxHash.hash32u(i.toString)))
  }
}
