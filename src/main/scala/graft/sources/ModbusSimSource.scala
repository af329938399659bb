package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import java.util

/** DataSource V2 streaming source simulating a fleet of Modbus-TCP
  * devices — the engine's stand-in for the reference's acquisition
  * layer (D1/D2, modbus.py:37-56) and its device simulator fixture
  * (modbus_server.py: holding register hr[addr] == addr, which makes
  * `UINT16 @ address A -> value A` the golden end-to-end check,
  * FIXTURES.md §1).
  *
  * Semantics:
  *  - each micro-batch is one poll tick; tick t reads every configured
  *    channel once (the reference's 1 Hz bus loop, daq-3i.py:238-251);
  *  - a channel is (channel_id, address); the simulated device returns
  *    registers [addr, addr+1, ... addr+count-1] mod 2^16 — exactly
  *    the simulator's ramp block;
  *  - rows are (channel_id, ts, registers, status), the input schema
  *    of graft.streaming.Ingest.decodeAndConvert;
  *  - channels are split across `numPartitions` input partitions: on a
  *    real deployment each PartitionReader owns its TCP connections
  *    (SURVEY.md §3.5 network boundary); here it owns the generator.
  *
  * Options: `channels` = "id@address" comma list; `registers` = words
  * per read (default 4); `startEpochSec`; `periodSec` (tick width);
  * `numPartitions`.
  */
class ModbusSimSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "modbus-sim"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ModbusSimSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ModbusSimTable(new CaseInsensitiveStringMap(properties))
}

object ModbusSimSource {
  val schema: StructType = StructType(Seq(
    StructField("channel_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("registers", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("status", IntegerType, nullable = false)))

  case class Config(
      channels: Seq[(Long, Int)], // (channel_id, register address)
      registersPerRead: Int,
      startEpochSec: Long,
      periodSec: Long,
      numPartitions: Int,
      maxTicks: Long) // <= 0: unbounded (live mode); > 0: stop advancing

  def parse(options: CaseInsensitiveStringMap): Config = {
    val chans = options.getOrDefault("channels", "1@5,2@17")
      .split(",").toSeq.map { s =>
        val Array(id, addr) = s.trim.split("@")
        (id.toLong, addr.toInt)
      }
    Config(
      chans,
      options.getInt("registers", 4),
      options.getLong("startEpochSec", 0L),
      options.getLong("periodSec", 1L),
      options.getInt("numPartitions", 2),
      options.getLong("maxTicks", 0L))
  }
}

private class ModbusSimTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "modbus_sim"
  override def schema(): StructType = ModbusSimSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ModbusSimSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new ModbusSimMicroBatchStream(ModbusSimSource.parse(options))
      }
    }
}

/** Offset = number of completed poll ticks. */
private case class TickOffset(tick: Long) extends Offset {
  override def json(): String = tick.toString
}

private class ModbusSimMicroBatchStream(config: ModbusSimSource.Config)
    extends MicroBatchStream with SupportsAdmissionControl {
  // One tick per trigger — one device sweep per micro-batch, the
  // reference's acquisition cadence. A positive maxTicks bounds the
  // stream (lets processAllAvailable converge in tests and replay
  // jobs); live mode leaves it unbounded.
  //
  // Restart safety: `tick` must never regress below the checkpointed
  // offset, or committed ticks would be re-planned under NEW batch ids
  // (which the batchId-keyed idempotent sink cannot dedupe). Spark's
  // plain MicroBatchStream path calls latestOffset() WITHOUT handing
  // back the restored offset, so this source implements
  // SupportsAdmissionControl — that path passes the checkpointed start
  // offset into latestOffset(start, limit) — and additionally
  // re-learns the offset in deserializeOffset/planInputPartitions.
  private var tick = 0L
  private def observe(o: Long): Unit = synchronized { if (o > tick) tick = o }

  override def initialOffset(): Offset = TickOffset(0L)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[TickOffset].tick
    // reportLatestOffset/commit can run from other driver threads, so
    // the advance shares observe()'s lock — no unsynchronized RMW
    synchronized {
      if (s > tick) tick = s
      if (config.maxTicks <= 0L || tick < config.maxTicks) tick += 1
      TickOffset(tick)
    }
  }
  override def reportLatestOffset(): Offset = synchronized { TickOffset(tick) }
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "SupportsAdmissionControl source: latestOffset(start, limit) is used")
  override def deserializeOffset(json: String): Offset = {
    val o = json.toLong
    observe(o)
    TickOffset(o)
  }
  override def commit(end: Offset): Unit =
    observe(end.asInstanceOf[TickOffset].tick)
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TickOffset].tick, end.asInstanceOf[TickOffset].tick)
    observe(e)
    val parts = config.channels.zipWithIndex
      .groupBy(_._2 % config.numPartitions)
      .values.map(_.map(_._1))
    parts.map(chs => ModbusSimPartition(chs, s, e, config): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ModbusSimPartition]
      new ModbusSimPartitionReader(p)
    }
}

private case class ModbusSimPartition(
    channels: Seq[(Long, Int)],
    startTick: Long,
    endTick: Long,
    config: ModbusSimSource.Config) extends InputPartition

/** Generates one row per (tick, channel) for ticks in (start, end].
  * A real deployment opens its Modbus TCP connection here — the
  * network boundary lives inside the reader, never on the driver. */
private class ModbusSimPartitionReader(p: ModbusSimPartition)
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = for {
    t <- Iterator.range(p.startTick + 1, p.endTick + 1)
    (id, addr) <- p.channels.iterator
  } yield {
    val tsMicros = (p.config.startEpochSec + t * p.config.periodSec) * 1000000L
    // simulated device block: hr[a] == a (modbus_server.py:92)
    val regs = Array.tabulate(p.config.registersPerRead)(i => (addr + i) & 0xFFFF)
    InternalRow(id, tsMicros, ArrayData.toArrayData(regs), 0)
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
