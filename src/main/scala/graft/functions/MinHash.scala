package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused 64-lane MinHash over a shingle-hash array, as a native
  * Catalyst expression.
  *
  * The builtin formulation
  * `transform(sequence(0,63), s -> array_min(transform(hs, h -> xxhash64(h,s))))`
  * allocates 64 intermediate arrays of |shingles| longs per row and
  * recomputes `xxhash64(h, 42)`'s inner step 64×. This expression is
  * two primitive loops: per-element base hashes once, then the n×64
  * lane mins, with a single output allocation.
  *
  * BIT-IDENTICAL to the builtin: Spark's `xxhash64(h, s)` chains
  * XXH64.hashInt(s, XXH64.hashLong(h, 42)) — exactly what the fused
  * loop computes (asserted lane-for-lane by MinHashFusionSpec), so LSH
  * buckets, signatures, and every downstream result are unchanged.
  */
case class MinHashLanes(child: Expression, lanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(input: Any): Any =
    MinHash.lanes(input.asInstanceOf[ArrayData], lanes)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHash.lanes($c, $lanes)")

  override protected def withNewChildInternal(c: Expression): MinHashLanes =
    copy(child = c)
}

object MinHash {

  val Seed = 42L // Spark's xxhash64 default seed

  /** Shared by interpreted eval and generated code. Mirrors the builtin
    * null semantics: null shingle hashes are skipped (array_min ignores
    * nulls); a row with no usable shingles yields all-null lanes. */
  def lanes(hs: ArrayData, n: Int): ArrayData = {
    val m = hs.numElements()
    // pre-hash each element once: xxhash64's first chain step only
    // depends on the element, not the lane
    var usable = 0
    val base = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (!hs.isNullAt(i)) {
        base(usable) = XXH64.hashLong(hs.getLong(i), Seed)
        usable += 1
      }
      i += 1
    }
    if (usable == 0)
      return new GenericArrayData(Array.fill[Any](n)(null))
    val out = new Array[Long](n)
    var s = 0
    while (s < n) {
      var mn = Long.MaxValue
      var j = 0
      while (j < usable) {
        val v = XXH64.hashInt(s, base(j))
        if (v < mn) mn = v
        j += 1
      }
      out(s) = mn
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def minhashLanes(shingleHashes: Column, lanes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(MinHashLanes(
      ColumnBridge.expression(shingleHashes), lanes))
  }
}
