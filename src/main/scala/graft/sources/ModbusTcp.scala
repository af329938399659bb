package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException, IOException}
import java.net.{InetSocketAddress, Socket}

/** Minimal Modbus-TCP (MBAP) client for function code 3 — the live
  * counterpart of the reference's acquisition call
  * (modbus.py:37-56: `read_holding_registers` over
  * `ModbusTcpClient(host, port, timeout)`), built directly on the
  * public wire format (Modbus Application Protocol v1.1b, §4.1 MBAP
  * framing):
  *
  *   request  = [txn:2][proto=0:2][len:2][unit:1] [fn=3:1][addr:2][count:2]
  *   response = [txn:2][proto=0:2][len:2][unit:1] [fn:1][byteCount:1][regs:2N]
  *   error    = same header, fn | 0x80, then a 1-byte exception code.
  *
  * Differences from the reference, deliberate:
  *   - the reference opens a fresh TCP connection per register read
  *     (`with ModbusTcpClient(...)` inside `read_register`,
  *     modbus.py:43) — at one poll per channel per second that is a
  *     full handshake per sample. This client keeps the socket open
  *     across reads and reconnects only after a failure, which is both
  *     what production Modbus masters do and what a Spark
  *     PartitionReader wants (one connection per partition per
  *     micro-batch, amortized over every channel it owns);
  *   - only function code 3 is implemented, matching the reference's
  *     explicit refusal of anything else (modbus.py:48-49).
  *
  * Not thread-safe: each PartitionReader owns its own instance.
  */
final class ModbusTcpClient(host: String, port: Int, timeoutMs: Int)
    extends AutoCloseable {

  private var socket: Socket = _
  private var in: DataInputStream = _
  private var out: DataOutputStream = _
  private var txn = 0

  private def connect(): Unit = {
    val s = new Socket()
    s.connect(new InetSocketAddress(host, port), timeoutMs)
    s.setSoTimeout(timeoutMs) // per-read timeout (db_model.py:38 per-bus)
    s.setTcpNoDelay(true)
    socket = s
    in = new DataInputStream(s.getInputStream)
    out = new DataOutputStream(s.getOutputStream)
  }

  private def dropConnection(): Unit = {
    if (socket != null) {
      try socket.close() catch { case _: IOException => () }
      socket = null; in = null; out = null
    }
  }

  /** Read `count` holding registers at `address` from `unitId`.
    * Returns the unsigned 16-bit register words. Throws
    * [[ModbusException]] on a device error response and IOException on
    * transport failure/timeout; after either, the connection is
    * dropped so the next call reconnects (the caller maps any throw to
    * a status=-1 sample, bus.py:94-100). */
  def readHoldingRegisters(unitId: Int, address: Int, count: Int): Array[Int] = {
    require(count >= 1 && count <= 125, s"count $count outside Modbus limit [1,125]")
    try {
      if (socket == null) connect()
      txn = (txn + 1) & 0xFFFF
      out.writeShort(txn)
      out.writeShort(0) // protocol id
      out.writeShort(6) // bytes to follow: unit + fn + addr + count
      out.writeByte(unitId)
      out.writeByte(3) // MODBUS_FUNC_READHOLDING (modbus.py:9)
      out.writeShort(address)
      out.writeShort(count)
      out.flush()

      val rxTxn = in.readUnsignedShort()
      val rxProto = in.readUnsignedShort()
      val rxLen = in.readUnsignedShort()
      val _rxUnit = in.readUnsignedByte()
      if (rxTxn != txn) throw new IOException(
        s"MBAP transaction mismatch: sent $txn, got $rxTxn")
      if (rxProto != 0) throw new IOException(s"MBAP protocol id $rxProto != 0")
      val fn = in.readUnsignedByte()
      if ((fn & 0x80) != 0) {
        val code = in.readUnsignedByte()
        // a clean error response leaves the stream aligned — keep the
        // connection, the device is alive and talking
        throw new ModbusException(s"device exception 0x${code.toHexString} " +
          s"for fn ${fn & 0x7F} @ $address")
      }
      if (fn != 3) throw new IOException(s"unexpected function code $fn in response")
      val byteCount = in.readUnsignedByte()
      if (byteCount != 2 * count || rxLen != 3 + byteCount)
        throw new IOException(
          s"malformed response: byteCount $byteCount, len $rxLen for count $count")
      Array.fill(count)(in.readUnsignedShort())
    } catch {
      case e: ModbusException => throw e // stream still aligned
      case e: EOFException => dropConnection(); throw e
      case e: IOException => dropConnection(); throw e
    }
  }

  override def close(): Unit = dropConnection()
}

/** Device-reported Modbus error (exception response) — distinct from a
  * transport failure; both map to status=-1 at the source
  * (bus.py:94-100), but an exception response keeps the connection. */
final class ModbusException(msg: String) extends IOException(msg)
