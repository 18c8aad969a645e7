package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

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
  */
class BottomKSample(k: Int)
    extends Aggregator[(String, Long), ArrayBuffer[(String, Long)],
      Seq[(String, Long)]] {

  override def zero: ArrayBuffer[(String, Long)] = ArrayBuffer.empty

  private def trim(b: ArrayBuffer[(String, Long)])
      : ArrayBuffer[(String, Long)] = {
    if (b.length > k) {
      val sorted = b.sortBy(identity)
      b.clear()
      b ++= sorted.take(k)
    }
    b
  }

  override def reduce(b: ArrayBuffer[(String, Long)],
      in: (String, Long)): ArrayBuffer[(String, Long)] =
    trim(b += in)

  override def merge(a: ArrayBuffer[(String, Long)],
      b: ArrayBuffer[(String, Long)]): ArrayBuffer[(String, Long)] =
    trim(a ++= b)

  override def finish(b: ArrayBuffer[(String, Long)])
      : Seq[(String, Long)] = b.sortBy(identity).take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(String, Long)]] =
    Encoders.kryo[ArrayBuffer[(String, Long)]]
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
