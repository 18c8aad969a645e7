package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic uniform sampling as a typed `Aggregator` (the U2
  * extension point, SURVEY §2.9): keep the k records with the smallest
  * hash of their key.
  *
  * Hash-ordered bottom-k is a mergeable sketch: partial buffers combine
  * associatively, so Spark plans it as a partial+final aggregate — one
  * pass, no global sort, O(k) state per partition. The same k rows come
  * back no matter how the data is partitioned, which makes distributed
  * sampling reproducible (and auditable against `ORDER BY hash LIMIT k`
  * in any engine with the same hash). Bonus: the k-th smallest
  * normalized hash estimates distinct cardinality (bottom-k / KMV
  * sketch).
  *
  * The buffer is encoded with a Tungsten `ExpressionEncoder` (not
  * `Encoders.kryo`): Kryo's `FieldSerializer` needs `--add-opens`
  * reflective access to JDK internals on Java 17+, which plain-JVM
  * launches (no spark-submit wrapper) don't have — and the native
  * encoder is faster anyway.
  */
class BottomKSample(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)],
      Seq[(String, Long)]] {

  override def zero: Seq[(String, Long)] = Vector.empty

  // Amortize: let the buffer grow to 4k before re-sorting down to k.
  private def trim(b: Seq[(String, Long)]): Seq[(String, Long)] =
    if (b.length > 4 * k) b.sorted.take(k) else b

  override def reduce(b: Seq[(String, Long)],
      in: (String, Long)): Seq[(String, Long)] =
    trim(b :+ in)

  override def merge(a: Seq[(String, Long)],
      b: Seq[(String, Long)]): Seq[(String, Long)] =
    trim(a ++ b)

  override def finish(b: Seq[(String, Long)]): Seq[(String, Long)] =
    b.sorted.take(k)

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder()
}
