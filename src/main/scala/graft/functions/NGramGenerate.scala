package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.Generator
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType,
  StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (SURVEY §2.9-U3, extension point
  * demonstration): emits one (pos, ngram) row per word n-gram of a
  * token array, building each n-gram inline instead of materializing
  * the intermediate n-gram ARRAY that the
  * `explode(transform(sequence(...), ...))` builtin formulation
  * allocates per row.
  *
  * Codegen note: this generator evaluates via CodegenFallback — the
  * builtin `explode` participates in whole-stage codegen, so for hot
  * paths the builtin formulation is preferred; this class exists to
  * prove (and spec) the Generator extension surface next to the
  * engine's codegen'd scalar expressions (SimHash64/DotProduct). */
case class NGramGenerate(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"ngram_generate needs array<string>, got ${other.sql}")
    }
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Nil
    else {
      val sep = UTF8String.fromString(" ")
      val toks = Array.tabulate(arr.numElements())(arr.getUTF8String)
      (0 to toks.length - n).map { i =>
        InternalRow(i,
          UTF8String.concatWs(sep, toks.slice(i, i + n).toIndexedSeq: _*))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): NGramGenerate = copy(child = newChild)
}

object NGramGenerate {
  /** Generate (child columns ++ pos ++ ngram) rows from the named
    * array<string> column. The attribute resolves eagerly against the
    * input's analyzed plan (a raw Column would reach the node as an
    * unresolvable ColumnNode wrapper). */
  def apply(df: DataFrame, tokensCol: String, n: Int): DataFrame = {
    val plan = ColumnBridge.analyzed(df)
    val attr = plan.output.find(_.name == tokensCol).getOrElse(
      throw new IllegalArgumentException(
        s"column $tokensCol not in ${plan.output.map(_.name).mkString(", ")}"))
    ColumnBridge.ofRows(df.sparkSession,
      Generate(NGramGenerate(attr, n),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Nil, child = plan))
  }
}
