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

/** DataSource V2 streaming source for a fleet of Modbus-TCP devices —
  * the reference's acquisition layer (D1/D2, modbus.py:37-56) with two
  * reader modes behind one plan shape:
  *
  *  - `mode=sim` (default, short name `modbus-sim`): an in-process
  *    generator replaying the reference's device simulator fixture
  *    (modbus_server.py: holding register hr[addr] == addr, which
  *    makes `UINT16 @ address A -> value A` the golden end-to-end
  *    check, FIXTURES.md §1);
  *  - `mode=tcp` (short name `modbus-tcp`): a live MBAP/function-code-3
  *    client ([[ModbusTcpClient]]) polling a real device at
  *    `host`:`port` with the per-bus `timeoutMs` (db_model.py:38); a
  *    failed read (transport error, timeout, or device exception
  *    response) yields a status=-1 row with no registers instead of a
  *    sample, exactly the reference's error path (bus.py:94-100).
  *
  * Shared semantics:
  *  - each micro-batch is one poll tick; tick t reads every configured
  *    channel once (the reference's 1 Hz bus loop, daq-3i.py:238-251);
  *  - rows are (channel_id, ts, registers, status), the input schema
  *    of graft.streaming.Ingest.decodeAndConvert; ts is tick-derived
  *    (startEpochSec + tick*periodSec) in BOTH modes so a replayed
  *    micro-batch regenerates the same keys — the idempotent sink
  *    depends on it (a wall-clock ts would fork the key space on every
  *    replay);
  *  - channels are split across `numPartitions` input partitions; in
  *    tcp mode each PartitionReader owns ONE connection for all its
  *    channels in the batch (SURVEY.md §3.5 network boundary — the
  *    driver never touches a socket).
  *
  * Options: `channels` = comma list of `id@address[@count[@unit]]`
  * (count defaults to `registers`, unit to `unitId`); `registers` =
  * default words per read (default 4); `unitId` (default 1);
  * `startEpochSec`; `periodSec` (tick width); `numPartitions`;
  * `maxTicks`; tcp mode adds `host`, `port`, `timeoutMs` (default
  * 1000), `funcCode` (must be 3 — the only implemented function,
  * modbus.py:48-49).
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

/** `spark.readStream.format("modbus-tcp")` — the live-client mode as a
  * first-class format name (equivalent to `modbus-sim` with
  * `mode=tcp`). */
class ModbusTcpSource extends ModbusSimSource {
  override def shortName(): String = "modbus-tcp"
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val withMode = new util.HashMap[String, String](properties)
    withMode.put("mode", "tcp")
    new ModbusSimTable(new CaseInsensitiveStringMap(withMode))
  }
}

object ModbusSimSource {
  val schema: StructType = StructType(Seq(
    StructField("channel_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("registers", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("status", IntegerType, nullable = false)))

  /** One polled channel: id, register address, words per read (the
    * reference derives this from the format code — FORMAT_LENGTH,
    * modbus.py:26-29), Modbus unit/device id (db_model.py:14). */
  case class Chan(id: Long, addr: Int, count: Int, unit: Int)

  case class Config(
      channels: Seq[Chan],
      startEpochSec: Long,
      periodSec: Long,
      numPartitions: Int,
      maxTicks: Long, // <= 0: unbounded (live mode); > 0: stop advancing
      mode: String, // "sim" | "tcp"
      host: String,
      port: Int,
      timeoutMs: Int)

  def parse(options: CaseInsensitiveStringMap): Config = {
    val defaultCount = options.getInt("registers", 4)
    val defaultUnit = options.getInt("unitId", 1)
    val chans = options.getOrDefault("channels", "1@5,2@17")
      .split(",").toSeq.map { s =>
        val parts = s.trim.split("@")
        Chan(parts(0).toLong, parts(1).toInt,
          if (parts.length > 2) parts(2).toInt else defaultCount,
          if (parts.length > 3) parts(3).toInt else defaultUnit)
      }
    val mode = options.getOrDefault("mode", "sim").toLowerCase
    require(mode == "sim" || mode == "tcp", s"mode must be sim|tcp, got $mode")
    // the reference refuses any function code but READHOLDING=3
    // (modbus.py:48-49) — fail at plan time, not per-row
    val fn = options.getInt("funcCode", 3)
    require(fn == 3, s"function code $fn not yet implemented (only 3)")
    if (mode == "tcp") require(options.containsKey("host") && options.containsKey("port"),
      "tcp mode requires host and port options")
    Config(
      chans,
      options.getLong("startEpochSec", 0L),
      options.getLong("periodSec", 1L),
      options.getInt("numPartitions", 2),
      options.getLong("maxTicks", 0L),
      mode,
      options.getOrDefault("host", ""),
      options.getInt("port", 502),
      options.getInt("timeoutMs", 1000))
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
      if (p.config.mode == "tcp") new ModbusTcpPartitionReader(p)
      else new ModbusSimPartitionReader(p)
    }
}

private case class ModbusSimPartition(
    channels: Seq[ModbusSimSource.Chan],
    startTick: Long,
    endTick: Long,
    config: ModbusSimSource.Config) extends InputPartition

/** Generates one row per (tick, channel) for ticks in (start, end]
  * from the in-process simulator ramp. */
private class ModbusSimPartitionReader(p: ModbusSimPartition)
    extends PartitionReader[InternalRow] {
  private val rows: Iterator[InternalRow] = for {
    t <- Iterator.range(p.startTick + 1, p.endTick + 1)
    ch <- p.channels.iterator
  } yield {
    val tsMicros = (p.config.startEpochSec + t * p.config.periodSec) * 1000000L
    // simulated device block: hr[a] == a (modbus_server.py:92)
    val regs = Array.tabulate(ch.count)(i => (ch.addr + i) & 0xFFFF)
    InternalRow(ch.id, tsMicros, ArrayData.toArrayData(regs), 0)
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** Live mode: one MBAP connection per partition per micro-batch,
  * amortized over every (tick, channel) read this partition owns — the
  * network boundary lives inside the reader, never on the driver. A
  * failed read maps to a status=-1 row with no registers
  * (bus.py:94-100) and the next read reconnects; a device exception
  * response keeps the connection (the device is alive and talking). */
private class ModbusTcpPartitionReader(p: ModbusSimPartition)
    extends PartitionReader[InternalRow] {
  private val client =
    new ModbusTcpClient(p.config.host, p.config.port, p.config.timeoutMs)
  private val emptyRegs = ArrayData.toArrayData(Array.empty[Int])
  private val rows: Iterator[InternalRow] = for {
    t <- Iterator.range(p.startTick + 1, p.endTick + 1)
    ch <- p.channels.iterator
  } yield {
    val tsMicros = (p.config.startEpochSec + t * p.config.periodSec) * 1000000L
    try {
      val regs = client.readHoldingRegisters(ch.unit, ch.addr, ch.count)
      InternalRow(ch.id, tsMicros, ArrayData.toArrayData(regs), 0)
    } catch {
      case _: java.io.IOException => // transport failure, timeout, or
        // device exception response: sample becomes a status=-1 row
        InternalRow(ch.id, tsMicros, emptyRegs, -1)
    }
  }
  private var current: InternalRow = _
  override def next(): Boolean = {
    if (rows.hasNext) { current = rows.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = client.close()
}
