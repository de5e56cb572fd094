package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration of the engine's native expressions
  * (SURVEY.md §3.3 entry point B + §2b G20): after registration,
  * `ngrams(text, 3)` and `first_char_partition(key, 7)` are callable
  * from `spark.sql`, and `explode(ngrams(...))` is the engine's UDTF
  * form — a generator over a native array-returning expression.
  */
object GraftFunctions {

  /** Constant integer argument: any FOLDABLE integer expression is
    * accepted (`3`, `1 + 2`, `CAST('3' AS INT)`…) and folded at
    * resolution time — the reference parameterizes n at the CLI
    * (reference/WordCount.java:129-136), so the SQL surface must take
    * any constant expression a caller substitutes in, not only a bare
    * literal. Non-constant (per-row) n stays rejected: the expressions
    * are planned with a fixed n. */
  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case e if e.foldable && e.dataType == IntegerType =>
      e.eval() match {
        case v: Int => v
        case null => throw new IllegalArgumentException(
          s"$fn argument $pos must not be null")
      }
    case other => throw new IllegalArgumentException(
      s"$fn argument $pos must be a constant integer expression, got $other")
  }

  private val ngramsInfo = new ExpressionInfo(
    classOf[NGramsExpr].getName, null, "ngrams",
    "_FUNC_(str, n) - normalized sliding n-gram windows of str (array<string>).", "")
  private def ngramsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(child, n) => NGramsExpr(child, intArg(n, "ngrams", 2))
    case _ => throw new IllegalArgumentException("ngrams(str, n) takes 2 arguments")
  }

  private val fcpInfo = new ExpressionInfo(
    classOf[FirstCharPartitionExpr].getName, null, "first_char_partition",
    "_FUNC_(str, numPartitions) - the reference engine's first-char partition id.", "")
  private def fcpBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(child, n) =>
      FirstCharPartitionExpr(child, intArg(n, "first_char_partition", 2))
    case _ => throw new IllegalArgumentException(
      "first_char_partition(str, numPartitions) takes 2 arguments")
  }

  /** Register on a LIVE session (ad-hoc / notebook use). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(FunctionIdentifier("ngrams"), ngramsInfo, ngramsBuilder _)
    reg.registerFunction(FunctionIdentifier("first_char_partition"), fcpInfo, fcpBuilder _)
  }

  /** Register through [[SparkSessionExtensions]] (the
    * `spark.sql.extensions=graft.GraftExtensions` production path). */
  def inject(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("ngrams"), ngramsInfo, ngramsBuilder))
    e.injectFunction((FunctionIdentifier("first_char_partition"), fcpInfo, fcpBuilder))
  }
}
