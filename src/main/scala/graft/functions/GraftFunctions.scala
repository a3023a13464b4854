package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for graft's custom Catalyst expressions, both as a
  * `SparkSessionExtensions` class (spark.sql.extensions=
  * graft.functions.GraftExtensions — cluster-wide, survives session
  * cloning) and as a runtime `register(spark)` for existing sessions.
  */
object GraftFunctions {
  private def sisBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 2, "sorted_intersect_size takes exactly 2 arguments")
    SortedIntersectSize(children.head, children(1))
  }

  private def simhashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1, "simhash60 takes exactly 1 argument")
    SimHash60(children.head)
  }

  private def polyHashBuilder(children: Seq[Expression]): Expression = {
    require(children.size == 1, "poly_hash takes exactly 1 argument")
    PolyHash(children.head)
  }

  val info = new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size")
  val simhashInfo = new ExpressionInfo(classOf[SimHash60].getName, "simhash60")
  val polyHashInfo = new ExpressionInfo(classOf[PolyHash].getName, "poly_hash")

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_size", sisBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", simhashBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "poly_hash", polyHashBuilder, "built-in")
  }
}

/** Session-extension entry point: inject graft functions at session
  * build time (SURVEY.md §3 — extension registration path).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_size"),
      GraftFunctions.info,
      (children: Seq[Expression]) => SortedIntersectSize(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash60"),
      GraftFunctions.simhashInfo,
      (children: Seq[Expression]) => SimHash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      GraftFunctions.polyHashInfo,
      (children: Seq[Expression]) => PolyHash(children.head)))
  }
}
