package graft.sources.v2

import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector: a deterministic synthetic document corpus —
  * the "generate test corpora of any size without writing files" source,
  * and the engine's exercise of the full V2 read path:
  *
  *  - `SupportsPushDownFilters`: doc_id range/equality predicates become
  *    GENERATION bounds — a pushed `doc_id >= N` doesn't filter rows, it
  *    prevents them from ever existing (the V2 analog of partition
  *    pruning; at 100 TB the difference between generating a shard and
  *    generating the world). Non-doc_id filters are left to Spark.
  *  - `SupportsPushDownRequiredColumns`: pruned columns are never
  *    materialized (no text synthesis for a `count(doc_id)`).
  *  - Planned as `numPartitions` equal id-range slices, each read by an
  *    independent, driver-state-free `PartitionReader` — embarrassingly
  *    parallel on any cluster.
  *
  * Content derives from a seeded per-id hash, so any two reads (any
  * partitioning, any pushdown) agree row for row.
  *
  * Usage: `spark.read.format("graft.sources.v2.SyntheticDocs")
  *   .option("rows", 1000).option("partitions", 8).load()`
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticDocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("partitions")).map(_.toInt).getOrElse(4))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("lang", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  private val Words = Vector("spark", "scan", "merge", "sort", "table", "row",
    "key", "agg", "join", "part", "hash", "window", "batch", "line")
  private val Langs = Vector("en", "es", "de")

  /** Deterministic per-id content (mixmur-style bit scramble). */
  private def mix(id: Long, salt: Long): Long = {
    var h = id * 0x9e3779b97f4a7c15L + salt
    h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 29
    h
  }

  def langOf(id: Long): String = Langs((mix(id, 1) % 3).abs.toInt)

  def textOf(id: Long): String = {
    val n = 5 + (mix(id, 2) % 20).abs.toInt
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Words((mix(id, 3 + i) % Words.length).abs.toInt))
      i += 1
    }
    sb.toString
  }
}

final class SyntheticDocsTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, parts)
}

final class SyntheticDocsScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L          // inclusive generation bound
  private var hi = rows        // exclusive generation bound
  private var pushed = ArrayBuffer.empty[Filter]
  private var required: StructType = SyntheticDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val remaining = filters.filterNot {
      case GreaterThan("doc_id", v: Long)        => lo = math.max(lo, v + 1); pushed += GreaterThan("doc_id", v); true
      case GreaterThanOrEqual("doc_id", v: Long) => lo = math.max(lo, v); pushed += GreaterThanOrEqual("doc_id", v); true
      case LessThan("doc_id", v: Long)           => hi = math.min(hi, v); pushed += LessThan("doc_id", v); true
      case LessThanOrEqual("doc_id", v: Long)    => hi = math.min(hi, v + 1); pushed += LessThanOrEqual("doc_id", v); true
      case EqualTo("doc_id", v: Long)            => lo = math.max(lo, v); hi = math.min(hi, v + 1); pushed += EqualTo("doc_id", v); true
      case _ => false
    }
    remaining
  }
  override def pushedFilters(): Array[Filter] = pushed.toArray

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new SyntheticDocsScan(lo, hi, parts, required)
}

final class SyntheticDocsScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs[bounds=[$lo,$hi), cols=${required.fieldNames.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    val per = math.max(1L, (n + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => (lo + i * per, math.min(lo + (i + 1) * per, hi)))
      .filter { case (a, b) => a < b }
      .map { case (a, b) => SyntheticDocsPartition(a, b): InputPartition }
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticDocsReaderFactory(required)
}

final case class SyntheticDocsPartition(lo: Long, hi: Long) extends InputPartition

final class SyntheticDocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SyntheticDocsPartition]
    new PartitionReader[InternalRow] {
      private var id = p.lo - 1
      override def next(): Boolean = { id += 1; id < p.hi }
      override def get(): InternalRow = {
        // Only required columns are synthesized — pruning skips text gen.
        val vals = required.fieldNames.map {
          case "doc_id" => id: java.lang.Long
          case "lang"   => UTF8String.fromString(SyntheticDocs.langOf(id))
          case "text"   => UTF8String.fromString(SyntheticDocs.textOf(id))
          case "n_chars" => SyntheticDocs.textOf(id).length.toLong: java.lang.Long
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
