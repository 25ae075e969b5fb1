package graft.functions

import graft.SparkTestBase
import graft.text.FxHash

class FxHash64ExprSpec extends SparkTestBase {
  import spark.implicits._

  test("fxhash64 expression matches the engine's fx64 hasher (codegen path)") {
    functions.registerAll(spark)
    val words = Seq("tea", "cup", "Cup", "of", "space", "station", "étude", "")
    val got = words.toDF("w")
      .select($"w", functions.fxhash64($"w").as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === (FxHash.hash64(w) & Long.MaxValue), s"mismatch for '$w'")
      assert(got(w) === graft.bm25.Fx64Hasher.hash(w), s"hasher mismatch for '$w'")
    }
    // reference README vector (hash64 cup = 3288102823240002853 is already
    // non-negative, so the mask is the identity on it)
    assert(got("cup") === 3288102823240002853L)
  }

  test("fxhash64 stays inside whole-stage codegen") {
    functions.registerAll(spark)
    val df = spark.range(4).selectExpr("cast(id as string) as w")
      .select(functions.fxhash64($"w").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fxhash64"), s"expected codegen:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq ===
      (0 until 4).map(i => FxHash.hash64(i.toString) & Long.MaxValue))
  }
}
