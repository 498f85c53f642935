package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSessionExtensions

class KernelSubstitutionSpec extends SparkSpec {
  import spark.implicits._

  test("declarative HOF dot-product is rewritten to the codegen kernel") {
    spark.experimental.extraOptimizations = Seq(KernelSubstitution)
    try {
      // non-literal input so constant folding can't collapse the plan
      val df = spark.range(3)
        .select(
          transform(sequence(lit(0), lit(2)), i => i.cast("double") + col("id")).as("a"),
          transform(sequence(lit(0), lit(2)), i => i.cast("double") * 2 + col("id")).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        df.queryExecution.optimizedPlan.toString)
      // id=0: a=[0,1,2] b=[0,2,4] -> 0+2+8 = 10
      assert(df.orderBy(col("d")).head.getDouble(0) == 10.0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("substituted plan yields NULL on unequal lengths, like the HOF") {
    spark.experimental.extraOptimizations = Seq(KernelSubstitution)
    try {
      // a has 3 elements, b has 2 -> zip_with pads with null -> HOF NULL;
      // the guarded kernel must return NULL too (not a partial sum)
      val df = spark.range(1)
        .select(
          transform(sequence(lit(0), lit(2)), i => i.cast("double") + col("id")).as("a"),
          transform(sequence(lit(0), lit(1)), i => i.cast("double") + col("id")).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("d"))
      assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        df.queryExecution.optimizedPlan.toString)
      assert(df.head.isNullAt(0))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule does not fire on nullable-element arrays (HOF would yield NULL)") {
    spark.experimental.extraOptimizations = Seq(KernelSubstitution)
    try {
      // when(...) makes the lambda nullable -> containsNull=true -> no rewrite
      val df = spark.range(2)
        .select(
          transform(sequence(lit(0), lit(2)),
            i => when(i > 1, i.cast("double")).otherwise(lit(null))).as("a"),
          transform(sequence(lit(0), lit(2)), i => i.cast("double")).as("b"))
        .select(aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("d"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.head.isNullAt(0)) // null element nulls the fold
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule leaves non-matching aggregates alone") {
    spark.experimental.extraOptimizations = Seq(KernelSubstitution)
    try {
      val df = Seq(Array(1.0, 2.0)).toDF("a")
        .select(aggregate(col("a"), lit(0.0), _ + _).as("s"))
      assert(!df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(df.head.getDouble(0) == 3.0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("GraftExtensions wires rule + functions into a session builder") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register without throwing
    succeed
  }
}
