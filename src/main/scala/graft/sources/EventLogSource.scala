package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 TableProvider for a line-oriented "legacy event log"
  * format: `event_id|ts_micros|user_id|event_type|value` per line, one
  * of the pipe-delimited interchange dumps every migration inherits.
  *
  * The point is the ENGINE surface, not the format: a full v2
  * connector with
  *  - one InputPartition PER FILE (scan parallelism = file count, the
  *    split model a 100 TB log directory needs — files are read
  *    independently by executors, never through the driver),
  *  - COLUMN PRUNING pushed into the reader
  *    (SupportsPushDownRequiredColumns): a `select(event_type)` parses
  *    one field per line instead of five — plan-asserted in
  *    EventLogSourceSpec via the scan's ReadSchema,
  *  - timestamps carried as raw micros into Spark's internal
  *    TimestampType representation (no string round-trip), and the
  *    double field round-tripped through Double.toString/parseDouble,
  *    which is exact by construction.
  *
  * Registered by CLASS NAME: `spark.read.format("graft.sources.eventlog")`
  * resolves via the DataSourceRegister service loader is not used here —
  * q198 loads it as `.format(classOf[EventLogSource].getName)`. */
class EventLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  /** Service-loader registration (round 9): `format("eventlog")` now
    * works alongside the class-name form q198 documents. */
  override def shortName(): String = "eventlog"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventLogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new EventLogTable(properties.get("path"))
}

object EventLogSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Render a DataFrame of events as eventlog lines (the writer side is
    * plain `text` output — the v2 connector under test is the READER). */
  def toLines(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.select(concat_ws("|",
      col("event_id"), unix_micros(col("ts")), col("user_id"),
      col("event_type"), col("value").cast("string")).as("value"))
  }
}

class EventLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"eventlog($path)"
  override def schema(): StructType = EventLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new EventLogScanBuilder(path)
}

class EventLogScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = EventLogSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve source field order so the reader's parse loop stays
    // a single left-to-right walk over the split line
    val keep = requiredSchema.fieldNames.toSet
    required = StructType(EventLogSource.schema.filter(f =>
      keep.contains(f.name)))
  }

  override def build(): Scan = new EventLogScan(path, required)
}

class EventLogScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    EventLogScan.listFiles(path).map(f =>
      EventLogPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    EventLogScan.factory(required)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new EventLogMicroBatchStream(path, required)
}

object EventLogScan {
  def listFiles(path: String): Array[String] = {
    val dir = new java.io.File(path)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).sorted
  }

  def factory(required: StructType): PartitionReaderFactory =
    new EventLogReaderFactory(
      required.fieldNames.map(n => EventLogSource.schema.fieldIndex(n)))
}

/** The STREAMING half of the connector: the sorted file list is the
  * log, an offset is "how many files have been consumed", and each
  * micro-batch plans exactly the files that appeared between two
  * offsets — the tailing-directory source every ingest pipeline starts
  * with, expressed through the v2 MicroBatchStream contract
  * (initialOffset → latestOffset → planInputPartitions(start, end) →
  * commit). Readers are the SAME per-file readers the batch side uses;
  * only offset bookkeeping is new. */
case class EventLogOffset(n: Int)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = s"""{"n":$n}"""
}

class EventLogMicroBatchStream(path: String, required: StructType)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = EventLogOffset(0)

  override def latestOffset(): Offset =
    EventLogOffset(EventLogScan.listFiles(path).length)

  override def deserializeOffset(json: String): Offset =
    EventLogOffset("\"n\"\\s*:\\s*(\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
      .getOrElse(sys.error(s"bad eventlog offset: $json")))

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s0 = start.asInstanceOf[EventLogOffset].n
    val e0 = end.asInstanceOf[EventLogOffset].n
    EventLogScan.listFiles(path).slice(s0, e0)
      .map(f => EventLogPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    EventLogScan.factory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class EventLogPartition(file: String) extends InputPartition

/** `fieldIdx(i)` = source-field position of output column i. */
class EventLogReaderFactory(fieldIdx: Array[Int])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[EventLogPartition].file
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(file, "UTF-8")
      private val it = lines.getLines()
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!it.hasNext) return false
        val parts = it.next().split('|')
        val values = fieldIdx.map {
          case 0 => parts(0).toLong
          case 1 => parts(1).toLong // micros ARE TimestampType's repr
          case 2 => parts(2).toLong
          case 3 => UTF8String.fromString(parts(3))
          case 4 => parts(4).toDouble
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
