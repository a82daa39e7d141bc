package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, so
  * `spark.sql("SELECT float_vector_cosine(a, b) ...")` works alongside the
  * Column API.
  *
  * Two registration paths:
  *  - `GraftExtensions` for
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions` config;
  *  - `GraftFunctions.register(spark)` for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.floatVectorCosineDescriptor)
    // whole-operator extension: AsOfJoinPlan -> AsOfJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  private[functions] val floatVectorCosineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("float_vector_cosine"),
    new ExpressionInfo(classOf[FloatVectorCosine].getName, "float_vector_cosine"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"float_vector_cosine expects 2 arguments, got ${exprs.length}")
      FloatVectorCosine(exprs.head, exprs(1))
    })

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    val (id, info, builder) = floatVectorCosineDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
