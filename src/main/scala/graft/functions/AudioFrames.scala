package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Short-time frame energies over a binary PCM blob, as a native
  * Catalyst expression.
  *
  * The builtin-composition form (hex() → per-sample conv(substr(…)))
  * allocates two strings PER BYTE and walks the hex string once per
  * window position — O(win) string work per sample. This expression
  * reads the raw bytes directly: one allocation for the output array,
  * a rolling-sum loop (each sample's s² enters once and leaves once,
  * so cost is O(n) — not O(n·win/hop)), and `doGenCode` emits a direct
  * static call so the expression sits INSIDE whole-stage codegen,
  * where higher-order array lambdas (the transform/aggregate form)
  * never go. Same arithmetic as the SQL oracle states over
  * hex(encode(text)) — the expression changes cost, not semantics.
  */
case class FrameEnergies(child: Expression, win: Int, hop: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    AudioFrames.compute(input.asInstanceOf[Array[Byte]], win, hop)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.AudioFrames.compute($c, $win, $hop)")

  override protected def withNewChildInternal(c: Expression): FrameEnergies =
    copy(child = c)
}

object AudioFrames {

  /** Shared by interpreted eval and generated code. Rolling window sum:
    * energy(f+1) = energy(f) - Σ leaving hop + Σ entering hop, so total
    * cost is one pass over the samples regardless of win/hop overlap. */
  def compute(bytes: Array[Byte], win: Int, hop: Int): ArrayData = {
    val n = bytes.length
    if (n < win) return new GenericArrayData(Array.emptyLongArray)
    val nFrames = (n - win) / hop + 1
    val out = new Array[Long](nFrames)
    var acc = 0L
    var i = 0
    while (i < win) { val v = (bytes(i) & 0xff) - 128; acc += v.toLong * v; i += 1 }
    out(0) = acc
    var f = 1
    while (f < nFrames) {
      val drop = (f - 1) * hop
      var j = 0
      while (j < hop) {
        val vOut = (bytes(drop + j) & 0xff) - 128
        val vIn = (bytes(drop + win + j) & 0xff) - 128
        acc += vIn.toLong * vIn - vOut.toLong * vOut
        j += 1
      }
      out(f) = acc
      f += 1
    }
    new GenericArrayData(out)
  }

  def frameEnergies(content: Column, win: Int, hop: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      FrameEnergies(ColumnBridge.expression(content), win, hop))
  }
}
