package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash over a token array, as a native Catalyst expression.
  *
  * Chosen per the extension-point preference order (custom `Expression`
  * over UDF): evaluation stays on `UTF8String` bytes inside the JVM with
  * zero serialization, and `doGenCode` emits a direct static call so the
  * expression lives INSIDE whole-stage codegen — no row boxing, no
  * virtual `eval` dispatch (what `CodegenFallback` would pay per row).
  *
  * Algorithm: FNV-1a 64-bit hash per token; for each of the 64 bit
  * positions accumulate +1/-1 by the token-hash bit; the signature bit is
  * the accumulator's sign. Near-duplicate texts differ in few bits, so
  * hamming distance over the signature is a cheap near-dup signal.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // scalac emits a static forwarder on the SimHash companion class,
    // so generated Java can call it without MODULE$ plumbing
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash {

  /** Shared by interpreted eval and generated code (via the static
    * forwarder). Tight loops on primitive arrays, no allocation beyond
    * the 64-int counter block. */
  def compute(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** FNV-1a over the UTF8String's bytes — deterministic, allocation-free. */
  private[functions] def fnv1a64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  }
}
