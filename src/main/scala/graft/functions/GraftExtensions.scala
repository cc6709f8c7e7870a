package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.ColumnBridge

/** SparkSessionExtensions hook: registers graft's native expressions as
  * SQL functions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works on
  * any session built with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or `.withExtensions`). The Column API (`Similarity.cosine`) does not
  * need this — it builds the expression directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(
        classOf[CosineSim].getCanonicalName,
        null,
        "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float/double arrays, " +
          "computed in one fused codegen'd pass",
        ""),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim takes exactly 2 arguments")
        CosineSim(children.head, children(1))
      }
    )
  )

  /** Late registration into an already-built session (e.g. one handed to
    * us by a host that did not set `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      ColumnBridge.registerFunction(spark, id, info, builder)
    }
}
