package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reference-fidelity partition-id expression (SURVEY.md §2b G19).
  *
  * Reproduces the reference's custom partitioner math
  * (reference/WordCount.java:35-61, design reference/report.md:139-189):
  * keys are routed by first character — digits to partition 0, letters
  * to `(c - 'a') / (26 / numPartitions)` with INTEGER division (the
  * reference's uneven-bucket quirk, documented in SURVEY.md §2a, kept
  * deliberately: this expression is the fidelity artifact), clamped to
  * the last partition. At most 26 partitions, like the reference
  * (reference/WordCount.java:36-38).
  *
  * Implemented as a native Catalyst `UnaryExpression` with `doGenCode`
  * emitting straight-line Java — it fuses into whole-stage codegen with
  * zero function-call or UDF-serialization overhead (custom-operator
  * ladder step (b), SURVEY.md §4.3).
  *
  * Deviations from the reference, by design (SURVEY.md §2a quirks):
  * empty string → 0 (the reference would throw on charAt(0)); characters
  * below 'a' that aren't digits clamp to 0 (the reference could return a
  * negative partition and crash the shuffle).
  */
case class FirstCharPartitionExpr(child: Expression, numPartitions: Int)
    extends UnaryExpression {
  require(numPartitions >= 1 && numPartitions <= 26,
    s"numPartitions must be in [1, 26] (reference/WordCount.java:36-38), got $numPartitions")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_char_partition"

  private val boundary: Int = 26 / numPartitions

  override protected def nullSafeEval(input: Any): Any =
    FirstCharPartitioner.partitionOf(input.asInstanceOf[UTF8String], numPartitions)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("firstByte")
      val q = ctx.freshName("bucket")
      s"""
         |if ($c.numBytes() == 0) {
         |  ${ev.value} = 0;
         |} else {
         |  byte $b = $c.getByte(0);
         |  if ($b >= '0' && $b <= '9') {
         |    ${ev.value} = 0;
         |  } else {
         |    int $q = ($b - 'a') / $boundary;
         |    ${ev.value} = $q >= $numPartitions ? ${numPartitions - 1} : ($q < 0 ? 0 : $q);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FirstCharPartitionExpr =
    copy(child = newChild)
}

/** Interpreted form + Column API for [[FirstCharPartitionExpr]]. */
object FirstCharPartitioner {
  def partitionOf(s: UTF8String, numPartitions: Int): Int = {
    if (s.numBytes() == 0) return 0
    val b = s.getByte(0)
    if (b >= '0' && b <= '9') 0
    else {
      val q = (b - 'a') / (26 / numPartitions)
      if (q >= numPartitions) numPartitions - 1 else if (q < 0) 0 else q
    }
  }

  /** Column-API entry: `first_char_partition($"key", 7)`. */
  def apply(c: Column, numPartitions: Int): Column =
    GraftBridge.column(FirstCharPartitionExpr(GraftBridge.expression(c), numPartitions))
}
