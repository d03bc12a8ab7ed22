package graft.sources

import java.time.LocalDate
import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{DateType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 read path for the Lichess game-export API — the
  * "custom TableProvider later" option SURVEY §2.1 sketches for S1/S2:
  *
  * {{{
  * spark.read.format("graft.sources.LichessDataSource")
  *   .option("players", "thibault,german11")
  *   .option("perf_type", "bullet")
  *   .option("from_date", "2024-04-01").option("to_date", "2024-04-28")
  *   .option("transport", registryKeyOrClassName)
  *   .load()
  * }}}
  *
  * One InputPartition per (player, day): the fetch fans out across
  * executors instead of looping on the driver — the scale axis of this
  * source is exactly that partition count. Each row is one day's raw PGN
  * export (`player, perf_type, data_date, pgn`), the `Dataset[String]`
  * shape `ChessEtl.parse` / `Pipeline.runDay` already consume; parsing
  * stays in the existing operators so the source does IO only.
  *
  * Transports resolve per executor via [[LichessTransports]]: a registry
  * key (tests, same-JVM local mode) or a zero-arg class name
  * (cluster-safe).
  */
class LichessDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LichessDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new LichessTable(properties.asScala.toMap)
}

object LichessDataSource {
  val schema: StructType = StructType(Seq(
    StructField("player", StringType, nullable = false),
    StructField("perf_type", StringType, nullable = false),
    StructField("data_date", DateType, nullable = false),
    StructField("pgn", StringType, nullable = true)))
}

/** Executor-side transport resolution: registry key first, then a
  * zero-arg-constructor class name.
  */
object LichessTransports {
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, LichessTransport]()

  def register(key: String, transport: LichessTransport): Unit =
    registry.put(key, transport)

  def resolve(spec: String): LichessTransport = {
    val fromRegistry = registry.get(spec)
    if (fromRegistry != null) fromRegistry
    else Class.forName(spec).getDeclaredConstructor().newInstance()
      .asInstanceOf[LichessTransport]
  }
}

final class LichessTable(properties: Map[String, String])
    extends Table with SupportsRead {

  override def name(): String = "lichess"
  override def schema(): StructType = LichessDataSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LichessScan(properties ++ options.asScala)
    }
}

final class LichessScan(options: Map[String, String]) extends Scan with Batch {

  override def readSchema(): StructType = LichessDataSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val players = options.getOrElse("players",
      options.getOrElse("player", "thibault")).split(",").map(_.trim).filter(_.nonEmpty)
    val perfType = options.getOrElse("perf_type", "bullet")
    val from = LocalDate.parse(options.getOrElse("from_date",
      options.getOrElse("data_date", "2024-01-29")))
    val to = LocalDate.parse(options.getOrElse("to_date",
      options.getOrElse("data_date", "2024-01-29")))
    val transport = options.getOrElse("transport",
      sys.error("lichess source requires a `transport` option (registry key or class name)"))
    val token = options.getOrElse("token", "")
    val days = Iterator.iterate(from)(_.plusDays(1)).takeWhile(!_.isAfter(to)).toSeq
    (for { p <- players.toSeq; d <- days } yield
      LichessPartition(p, perfType, d.toEpochDay.toInt, transport, token): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new LichessPartitionReader(partition.asInstanceOf[LichessPartition])
    }
}

final case class LichessPartition(
    player: String,
    perfType: String,
    epochDay: Int,
    transportSpec: String,
    token: String) extends InputPartition

final class LichessPartitionReader(p: LichessPartition)
    extends PartitionReader[InternalRow] {

  private var emitted = false
  private var row: InternalRow = _

  override def next(): Boolean = {
    if (emitted) return false
    val client = new LichessClient(LichessTransports.resolve(p.transportSpec), p.token)
    val pgn = client.userGamesPgn(p.player, p.perfType, LocalDate.ofEpochDay(p.epochDay.toLong))
    row = InternalRow(
      UTF8String.fromString(p.player),
      UTF8String.fromString(p.perfType),
      p.epochDay,
      UTF8String.fromString(pgn))
    emitted = true
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
