package graft.functions

import graft.hl7.HL7
import org.apache.spark.sql.SparkSession

/** SQL front-door registration: the same LogicalPlan surface is reachable
  * via DataFrame API and `spark.sql(...)` (SURVEY.md §3 — we write no
  * parser; both land in Catalyst). Registers every engine-specific function
  * for SQL callers.
  */
object GraftFunctions {

  /** Idempotent; register once per session. */
  def registerAll(spark: SparkSession): Unit = {
    // hl7_msh9(msg) -> struct(_1 type, _2 event) | null
    HL7.register(spark)
    // vec_dot(a, b) -> double : fused codegen dot product
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs(0), exprs(1)), "built-in")
    // vec_norm(a) -> double
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm",
      exprs => org.apache.spark.sql.catalyst.expressions.Sqrt(
        FloatVecDot(exprs.head, exprs.head)),
      "built-in")
    // ngrams_table(text, n) -> TABLE(pos INT, ngram STRING): SQL-callable
    // table function (custom Generator; LATERAL VIEW / SELECT-list)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ngrams_table", exprs => NGramsGenerator(exprs(0), exprs(1)), "built-in")
    // cosine_sim(a, b) -> double, same association as VectorFunctions
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(
          FloatVecDot(exprs(0), exprs(1)),
          Multiply(Sqrt(FloatVecDot(exprs(0), exprs(0))),
            Sqrt(FloatVecDot(exprs(1), exprs(1)))))
      },
      "built-in")
  }
}
