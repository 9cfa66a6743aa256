package graft.streaming

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The JSON register map of `run plc client where type = modbus`:
  * parsing, validation, read planning, and value decode — the same
  * semantics as the reference's expand_modbus_register_map
  * (api/modbus_client.py:519), _batch_sorted_addresses (:1147) and
  * _decode_holding_input_value (:1183):
  *
  *   map = [ {"name":"sensor_1","register":0},
  *           {"name":"voltage","inputRegister":[0,1],"type":"long"},
  *           {"name":"temp","register":[2,3],"type":"float","swap":"words"},
  *           {"name":"door","coil":0} ]
  *
  * - exactly one source key per item: register | inputRegister |
  *   coil | input; an address is one int or a CONSECUTIVE int list
  * - type (register kinds only): long (1..4 registers, signed
  *   big-endian), float (2 registers, IEEE-754), byte (>4 registers,
  *   emitted as a word list)
  * - swap: bytes | words | both | none; scale / offset: numeric,
  *   force float output; coil/input accept no modifiers
  */
object ModbusMap {

  /** One map item. `kind` is the canonical prefix: hr (holding), ir
    * (input register), c (coil), di (discrete input). */
  final case class Point(name: String, kind: String, start: Int,
      count: Int, typ: Option[String], swap: Option[String],
      scale: Option[Double], offset: Option[Double]) {
    def isBits: Boolean = kind == "c" || kind == "di"
    def tag: String =
      if (count == 1) s"$kind:$start" else s"$kind:$start+$count"
  }

  /** A decoded point value (schema-stable for the landing row). */
  sealed trait Value
  final case class MLong(v: Long) extends Value
  final case class MDouble(v: Double) extends Value
  final case class MString(s: String) extends Value
  final case class MWords(ws: Seq[Int]) extends Value

  /** One wire request in a poll cycle. */
  final case class ReadOp(kind: String, start: Int, count: Int)

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"modbus map: $msg")

  def parse(json: String): Seq[Point] = {
    val root =
      try JsonMethods.parse(json)
      catch { case _: Exception => fail("not valid JSON") }
    val items = root match {
      case JArray(xs) => xs
      case JObject(fields) => fields.toMap.get("values") match {
        case Some(JArray(xs)) => xs
        case _ => fail("must be a JSON array (or object with key 'values')")
      }
      case _ => fail("must be a JSON array (or object with key 'values')")
    }
    if (items.isEmpty) fail("has no entries")
    items.zipWithIndex.map {
      case (JObject(fs), i) => parseItem(fs.toMap, i)
      case (_, i) => fail(s"item $i must be an object")
    }
  }

  private def num(v: JValue): Option[Double] = v match {
    case JInt(n) => Some(n.toDouble)
    case JLong(n) => Some(n.toDouble)
    case JDouble(n) => Some(n)
    case JDecimal(n) => Some(n.toDouble)
    case _ => None
  }

  private def parseItem(f: Map[String, JValue], i: Int): Point = {
    val name = f.get("name") match {
      case Some(JString(s)) if s.trim.nonEmpty => s.trim
      case _ => fail(s"item $i is missing non-empty 'name'")
    }
    val sources = Seq("register" -> "hr", "inputRegister" -> "ir",
      "coil" -> "c", "input" -> "di").filter(k => f.contains(k._1))
    if (sources.size != 1) fail(s"item '$name' must include exactly " +
      "one of register, inputRegister, coil, input")
    val (srcKey, kind) = sources.head
    // an address must be an integral 0..65535: writeShort would
    // silently wrap a negative or oversized address onto a DIFFERENT
    // register of the device (plausible-looking wrong data, no error)
    def addr(v: JValue): Int = {
      val d = num(v).getOrElse(
        fail(s"item '$name' address list must contain only integers"))
      if (d != Math.rint(d) || d < 0 || d > 65535)
        fail(s"item '$name': address ${v.values} must be an integer " +
          "in 0..65535")
      d.toInt
    }
    val (start, count) = f(srcKey) match {
      case a if num(a).isDefined => (addr(a), 1)
      case JArray(xs) =>
        if (xs.isEmpty) fail(s"item '$name' has empty address list")
        val addrs = xs.map(addr)
        addrs.sliding(2).foreach {
          case Seq(a, b) if b != a + 1 =>
            fail(s"item '$name': non-consecutive address list; " +
              "only contiguous blocks are supported")
          case _ => ()
        }
        (addrs.head, addrs.length)
      case _ => fail(s"item '$name' address must be an integer or a " +
        "list of consecutive integer addresses")
    }
    if (start + count - 1 > 65535)
      fail(s"item '$name': address span exceeds the 16-bit space")
    val isBits = kind == "c" || kind == "di"
    if (count > 1 && isBits && count > ModbusTcp.MaxBitsPerRead)
      fail(s"item '$name': requested bit count $count exceeds a safe " +
        s"single read (${ModbusTcp.MaxBitsPerRead})")
    if (count > 1 && !isBits && count > ModbusTcp.MaxRegistersPerRead)
      fail(s"item '$name': requested register count $count exceeds " +
        s"the Modbus per-request cap (${ModbusTcp.MaxRegistersPerRead})")
    val typ = f.get("type").map {
      case JString(s) if s.trim.nonEmpty => s.trim.toLowerCase
      case _ => fail(s"item '$name': 'type' must be a non-empty string")
    }
    val swap = f.get("swap").map {
      case JString(s) if Seq("bytes", "words", "both", "none")
          .contains(s.trim.toLowerCase) => s.trim.toLowerCase
      case _ => fail(s"item '$name': 'swap' must be one of " +
        "bytes|words|both|none")
    }
    val scale = f.get("scale").map(v => num(v).getOrElse(
      fail(s"item '$name': 'scale' must be a number")))
    val offset = f.get("offset").map(v => num(v).getOrElse(
      fail(s"item '$name': 'offset' must be a number")))
    if (isBits &&
        (typ.isDefined || swap.isDefined || scale.isDefined ||
          offset.isDefined))
      fail(s"item '$name': coil/input do not support modifiers")
    typ.foreach { t =>
      if (!Seq("long", "float", "byte").contains(t))
        fail(s"item '$name': type supports only 'long', 'float', " +
          "or 'byte'")
      if (t == "long" && (count < 1 || count > 4))
        fail(s"item '$name': type 'long' requires 1 to 4 " +
          "consecutive registers")
      // float wider than 2 words would silently fall back to a raw
      // word list (and drop scale/offset) — refuse at parse instead
      if (t == "float" && count > 2)
        fail(s"item '$name': type 'float' requires 1 or 2 " +
          "consecutive registers")
      if (t == "byte" && count <= 4)
        fail(s"item '$name': type 'byte' requires more than 4 " +
          "consecutive registers")
    }
    // the word half of swap only applies to a 2-register value
    // (decode would silently skip it for wider spans — refuse the
    // combination rather than land scrambled numbers)
    if (count > 2 && swap.exists(s => s == "words" || s == "both"))
      fail(s"item '$name': swap '${swap.get}' applies only to " +
        "2-register values")
    Point(name, kind, start, count, typ, swap, scale, offset)
  }

  /** Merge sorted single addresses into contiguous (start, count)
    * block reads, capped at maxBlock per request. */
  def batchSingles(addrs: Seq[Int], maxBlock: Int): Seq[(Int, Int)] = {
    val sorted = addrs.distinct.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < sorted.length) {
      val start = sorted(i)
      var count = 1
      i += 1
      while (i < sorted.length && sorted(i) == start + count &&
          count < maxBlock) {
        count += 1; i += 1
      }
      out += ((start, count))
    }
    out.toSeq
  }

  /** The poll-cycle read plan: per kind, single-address points merge
    * into block reads; each multi-address point is one read; repeated
    * (start, count) spans are deduplicated. Returns the wire ops plus
    * a resolver from point → (op, offset) for value extraction. */
  def plan(points: Seq[Point])
      : (Seq[ReadOp], Map[(String, Int, Int), (ReadOp, Int)]) = {
    val ops = scala.collection.mutable.LinkedHashSet.empty[ReadOp]
    val where =
      scala.collection.mutable.Map.empty[(String, Int, Int), (ReadOp, Int)]
    points.groupBy(_.kind).toSeq.sortBy(_._1).foreach {
      case (kind, ps) =>
        val maxBlock = if (kind == "c" || kind == "di")
          ModbusTcp.MaxBitsPerRead else ModbusTcp.MaxRegistersPerRead
        val (singles, multis) = ps.partition(_.count == 1)
        val batches = batchSingles(singles.map(_.start), maxBlock)
        singles.foreach { p =>
          val (bs, bc) = batches
            .find(b => p.start >= b._1 && p.start < b._1 + b._2).get
          val op = ReadOp(kind, bs, bc)
          ops += op
          where((kind, p.start, 1)) = (op, p.start - bs)
        }
        multis.foreach { p =>
          val op = ReadOp(kind, p.start, p.count)
          ops += op
          where((kind, p.start, p.count)) = (op, 0)
        }
    }
    (ops.toSeq, where.toMap)
  }

  private def swap16(w: Int): Int = {
    val v = w & 0xFFFF
    ((v & 0xFF) << 8) | (v >> 8)
  }

  private def applySwap(words: IndexedSeq[Int],
      mode: Option[String]): IndexedSeq[Int] = {
    val in = words.map(_ & 0xFFFF)
    mode match {
      case None | Some("none") => in
      case Some(m) =>
        val bytesSwapped =
          if (m == "bytes" || m == "both") in.map(swap16) else in
        if ((m == "words" || m == "both") && bytesSwapped.length == 2)
          IndexedSeq(bytesSwapped(1), bytesSwapped(0))
        else bytesSwapped
    }
  }

  /** Decode one point's raw words (already sliced from the wire
    * response) into its landed value. Bits decode upstream (0/1);
    * this handles the register kinds. */
  def decode(raw: IndexedSeq[Int], p: Point): Value = {
    val words = applySwap(raw, p.swap)
    val n = words.length
    val base: Value =
      if (n == 1) {
        val w = words(0) & 0xFFFF
        p.typ match {
          case Some("long") =>
            MLong(if ((w & 0x8000) != 0) w - 0x10000 else w)
          case Some("float") => MDouble(w.toDouble)
          case Some("byte") => MString((w & 0xFF).toString)
          case _ => MLong(w)
        }
      } else p.typ match {
        case Some("byte") => MWords(words)
        case Some("float") if n == 2 =>
          val bits = (words(0) << 16) | words(1)
          MDouble(java.lang.Float.intBitsToFloat(bits).toDouble)
        case Some("long") =>
          var total = 0L
          words.foreach(w => total = (total << 16) | (w & 0xFFFF))
          val bits = n * 16
          // at 64 bits the accumulated Long already IS the signed
          // (two's-complement) value — and 1L << 64 is a no-op shift
          MLong(
            if (bits < 64 && (total & (1L << (bits - 1))) != 0)
              total - (1L << bits)
            else total)
        case _ => MWords(words)
      }
    (base, p.scale, p.offset) match {
      case (_, None, None) => base
      case (MLong(v), s, o) =>
        MDouble(v.toDouble * s.getOrElse(1.0) + o.getOrElse(0.0))
      case (MDouble(v), s, o) =>
        MDouble(v * s.getOrElse(1.0) + o.getOrElse(0.0))
      case _ => base // scale/offset apply to numeric values only
    }
  }

  /** `{client}_{field}` dynamic table segment, sanitized like the
    * reference's modbus_dynamic_table_name (modbus_client.py:84-93):
    * safe chars, no leading digit, bounded length. */
  def dynamicSegment(s: String): String = {
    val t0 = s.replaceAll("[^0-9A-Za-z_]", "_")
    val t = if (t0.nonEmpty && t0.head.isDigit) "t_" + t0 else t0
    (if (t.isEmpty) "x" else t).take(120)
  }

  def dynamicTableName(client: String, field: String): String =
    s"${dynamicSegment(client)}_${dynamicSegment(field)}".take(200)

  /** Execute ONE poll cycle over a connected client: run the batched
    * read plan, then decode each point from its containing block.
    * Returns per-point `Left(error)` / `Right(json value)` — the
    * shared kernel of the standing poller (`run plc client`) and the
    * one-shot read (`get plc values`). A read failure (Modbus
    * exception or transport error) fails only the points inside that
    * block, mirroring the reference's per-tag error rows
    * (modbus_client.py:1290 read loop). */
  def readAll(client: ModbusTcpClient, unit: Int, points: Seq[Point])
      : Seq[(Point, Either[String, org.json4s.JValue])] =
    readAll(client, unit, points, plan(points))

  /** The standing-poller variant: the read plan is immutable per
    * client, so the caller compiles it ONCE at start and every poll
    * cycle reuses it. */
  def readAll(client: ModbusTcpClient, unit: Int, points: Seq[Point],
      compiled: (Seq[ReadOp], Map[(String, Int, Int), (ReadOp, Int)]))
      : Seq[(Point, Either[String, org.json4s.JValue])] = {
    import org.json4s._
    val (ops, where) = compiled
    val opResults: Map[ReadOp, Either[String, IndexedSeq[Int]]] =
      ops.map { op =>
        op -> (try Right(op.kind match {
          case "c" => client.readCoils(unit, op.start, op.count)
          case "di" =>
            client.readDiscreteInputs(unit, op.start, op.count)
          case "hr" =>
            client.readHoldingRegisters(unit, op.start, op.count)
          case "ir" =>
            client.readInputRegisters(unit, op.start, op.count)
        }) catch {
          case e @ ModbusError(_, _) => Left(e.getMessage)
          case e: java.io.IOException =>
            Left(Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        })
      }.toMap
    def jval(v: Value): JValue = v match {
      case MLong(x) => JLong(x)
      case MDouble(x) => JDouble(x)
      case MString(s) => JString(s)
      case MWords(ws) => JArray(ws.map(w => JLong(w.toLong)).toList)
    }
    points.map { p =>
      val (op, off) = where((p.kind, p.start, p.count))
      p -> opResults(op).map { vals =>
        val words = vals.slice(off, off + p.count)
        if (p.isBits) {
          if (p.count == 1) JLong(words.head.toLong)
          else JArray(words.map(w => JLong(w.toLong)).toList)
        } else jval(decode(words, p))
      }
    }
  }
}
