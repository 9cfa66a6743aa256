package graft.ingest

import org.apache.spark.sql.types._

/** EdgeLake-compatible schema inference: infer a column type from each
  * JSON value, widen across rows, freeze as a table schema.
  *
  * Reference semantics (/root/reference):
  *  - value -> type rules `json_to_sql/suggest_create_table.py:171-223`
  *    (`get_column_type_by_value`): bool before int; |int| <= 0x5F5E0FF ->
  *    INT else BIGINT; float with 1-5 fraction digits -> DECIMAL else
  *    FLOAT; uuid-shaped -> UUID; timestamp/date/time-shaped strings;
  *    digit string in a '*time*'-named column >= year 2000 -> TIMESTAMP
  *    (:201-203); IP -> CIDR; <= 8 chars -> CHAR(n); lists/dicts ->
  *    VARCHAR (:219-221).
  *  - widening lattice `suggest_create_table.py:123-165`
  *    (`resolve_data_type`): INT+DECIMAL -> DECIMAL, DECIMAL+FLOAT ->
  *    FLOAT, INT+BIGINT -> BIGINT, CHAR(n)+CHAR(m) -> CHAR(max), anything
  *    else -> VARCHAR. Ours is a proper join-semilattice (order-
  *    insensitive), which the reference's isn't quite — SURVEY §7 hard
  *    part 3.
  *  - system columns `suggest_create_table.py:255`: row_id,
  *    insert_timestamp, tsd_name, tsd_id.
  */
object SchemaInference {

  sealed trait ELType { def rank: Int }
  case object ELBool extends ELType { val rank = 0 }
  case object ELInt extends ELType { val rank = 1 }
  case object ELBigInt extends ELType { val rank = 2 }
  case object ELDecimal extends ELType { val rank = 3 }
  case object ELFloat extends ELType { val rank = 4 }
  case object ELUuid extends ELType { val rank = 5 }
  case object ELTimestamp extends ELType { val rank = 6 }
  case object ELDate extends ELType { val rank = 7 }
  case object ELTime extends ELType { val rank = 8 }
  case object ELCidr extends ELType { val rank = 9 }
  final case class ELChar(n: Int) extends ELType { val rank = 10 }
  case object ELVarchar extends ELType { val rank = 11 }

  private val intMax = 0x5F5E0FFL // suggest_create_table.py:176-180
  private val uuidRx =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r
  private val tsRx =
    "^\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$".r
  private val dateRx = "^\\d{4}-\\d{2}-\\d{2}$".r
  private val timeRx = "^\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$".r
  private val ipRx = "^(\\d{1,3}\\.){3}\\d{1,3}$".r
  private val floatRx = "^[+-]?\\d+\\.\\d+$".r
  // negative integers type as INT/BIGINT like the reference
  // (suggest_create_table.py:208: isdigit() OR '-' + digits)
  private val digitsRx = "^-?\\d+$".r

  /** Infer the EdgeLake type of one value (column name matters only for
    * the '*time*' digit-string rule). */
  def inferValue(columnName: String, value: Any): ELType = value match {
    case null => ELVarchar
    case _: Boolean => ELBool
    case i: Int => if (math.abs(i.toLong) <= intMax) ELInt else ELBigInt
    case l: Long => if (math.abs(l) <= intMax) ELInt else ELBigInt
    case d: Double => inferFloat(d)
    case f: Float => inferFloat(f.toDouble)
    case b: BigDecimal => inferFloat(b.toDouble)
    case s: String => inferString(columnName, s)
    case _: Seq[_] | _: Map[_, _] => ELVarchar // lists/dicts -> VARCHAR
    case _ => ELVarchar
  }

  private def inferFloat(d: Double): ELType = {
    // DECIMAL iff 1-5 fraction digits (suggest_create_table.py:182-186)
    val s = BigDecimal(d).bigDecimal.stripTrailingZeros.toPlainString
    val frac = s.indexOf('.') match {
      case -1 => 0
      case i => s.length - i - 1
    }
    if (frac >= 1 && frac <= 5) ELDecimal else ELFloat
  }

  private def inferString(columnName: String, s: String): ELType = s match {
    // the reference's first string rule (suggest_create_table.py:188):
    // an empty value is VARCHAR — CHAR(0) would be invalid DDL
    case "" => ELVarchar
    case _ if uuidRx.matches(s) => ELUuid
    case _ if tsRx.matches(s) => ELTimestamp
    case _ if dateRx.matches(s) => ELDate
    case _ if timeRx.matches(s) => ELTime
    case _ if ipRx.matches(s) => ELCidr
    case _ if digitsRx.matches(s) =>
      // '*time*'-named digit column at/after year 2000 (epoch seconds)
      if (columnName.toLowerCase.contains("time") &&
          s.length >= 10 && s.toDouble >= 946684800d) ELTimestamp
      else if (s.length > 9) ELBigInt
      else if (s.toLong <= intMax) ELInt else ELBigInt
    case _ if floatRx.matches(s) => inferFloat(s.toDouble)
    case _ if s.equalsIgnoreCase("true") || s.equalsIgnoreCase("false") => ELBool
    case _ if s.length <= 8 => ELChar(s.length)
    case _ => ELVarchar
  }

  /** Order-insensitive widening join (resolve_data_type lattice). */
  def widen(a: ELType, b: ELType): ELType = (a, b) match {
    case (x, y) if x == y => x
    case (ELInt, ELBigInt) | (ELBigInt, ELInt) => ELBigInt
    case (ELInt, ELDecimal) | (ELDecimal, ELInt) => ELDecimal
    case (ELInt, ELFloat) | (ELFloat, ELInt) => ELFloat
    case (ELBigInt, ELDecimal) | (ELDecimal, ELBigInt) => ELDecimal
    case (ELBigInt, ELFloat) | (ELFloat, ELBigInt) => ELFloat
    case (ELDecimal, ELFloat) | (ELFloat, ELDecimal) => ELFloat
    case (ELChar(n), ELChar(m)) => ELChar(math.max(n, m))
    case (ELTimestamp, ELDate) | (ELDate, ELTimestamp) => ELTimestamp
    case _ => ELVarchar
  }

  /** Infer a full schema from sampled rows (maps of column -> value).
    * Missing keys stay at their type from other rows; conflicting types
    * widen through the lattice — order-insensitive by construction. */
  def inferSchema(rows: Seq[Map[String, Any]]): Seq[(String, ELType)] = {
    val acc = scala.collection.mutable.LinkedHashMap.empty[String, ELType]
    rows.foreach(_.foreach { case (k, v) =>
      val t = inferValue(k, v)
      acc(k) = acc.get(k).map(widen(_, t)).getOrElse(t)
    })
    acc.toSeq
  }

  /** EdgeLake type -> Spark type (SURVEY §1.2 table). */
  def toSpark(t: ELType): DataType = t match {
    case ELBool => BooleanType
    case ELInt => IntegerType
    case ELBigInt => LongType
    case ELDecimal => DoubleType // practical choice per SURVEY §1.2
    case ELFloat => DoubleType
    case ELUuid => StringType
    case ELTimestamp => TimestampType
    case ELDate => DateType
    case ELTime => StringType // Spark has no TimeType
    case ELCidr => StringType
    case ELChar(_) => StringType
    case ELVarchar => StringType
  }

  /** EdgeLake type -> SQL DDL name (for `suggest create` parity output;
    * cross-engine unification generic/utils_sql.py:48-58). */
  def toDdl(t: ELType): String = t match {
    case ELBool => "BOOLEAN"
    case ELInt => "INT"
    case ELBigInt => "BIGINT"
    case ELDecimal => "DECIMAL"
    case ELFloat => "FLOAT"
    case ELUuid => "UUID"
    case ELTimestamp => "TIMESTAMP"
    case ELDate => "DATE"
    case ELTime => "TIME"
    case ELCidr => "CIDR"
    case ELChar(n) => s"CHAR($n)"
    case ELVarchar => "VARCHAR"
  }

  /** The system columns every operator table gets
    * (suggest_create_table.py:255): ingest row id, insert time, and the
    * two TSD ingest-ledger lineage columns. */
  val systemColumns: Seq[StructField] = Seq(
    StructField("row_id", LongType, nullable = false),
    StructField("insert_timestamp", TimestampType, nullable = false),
    StructField("tsd_name", StringType, nullable = true),
    StructField("tsd_id", IntegerType, nullable = true))

  /** Full CREATE-equivalent Spark schema: inferred user columns plus the
    * system columns. */
  def suggestCreate(rows: Seq[Map[String, Any]]): StructType = {
    val user = inferSchema(rows).map { case (n, t) =>
      StructField(n, toSpark(t), nullable = true)
    }
    StructType(systemColumns ++ user)
  }
}
