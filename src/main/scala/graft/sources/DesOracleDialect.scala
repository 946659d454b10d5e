package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** The Oracle-dialect type mapping for the live-DES JDBC slot — the
  * desdb dtype table (SURVEY §1.1 item 3, §1.2 rows 4–7) encoded as a
  * Spark `JdbcDialect` so `spark.read.jdbc` against a `dessci`-style
  * Oracle URL lands the SAME column types the reference's recarray
  * path produced, with two deliberate Spark-first upgrades.
  *
  * Reference mapping [pub: desdb/desdb.py get_numpy_descr-style
  * helper] → this dialect:
  *
  * | Oracle (cursor descr) | desdb dtype | here |
  * |---|---|---|
  * | NUMBER(p≤18, 0)       | i8          | LongType (exact) |
  * | NUMBER(p>18, 0)       | i8 (lossy!) | DecimalType(p, 0) |
  * | NUMBER(p, s>0)        | f8 (lossy!) | DecimalType(p, s) |
  * | NUMBER (unspecified)  | f8          | DecimalType(38, 10) |
  * | BINARY_DOUBLE         | f8          | DoubleType |
  * | BINARY_FLOAT          | f4          | FloatType |
  * | VARCHAR2(n)           | S{n}        | StringType |
  * | DATE                  | string      | TimestampType |
  * | FLOAT(b) (s = -127)   | f8          | DoubleType |
  *
  * The upgrades: (1) scaled/wide NUMBER keeps exact DecimalType
  * instead of collapsing to float8 — decimal exactness is the whole
  * determinism discipline of this engine (Det.scala), and a flux
  * stored as NUMBER(12,4) survives aggregation bit-exactly; (2)
  * Oracle DATE carries a time-of-day, so it maps to TimestampType
  * (the session TZ is pinned UTC everywhere in this repo), not a
  * string. NUMBER with UNSPECIFIED precision reports p=0 through
  * JDBC; Oracle stores up to 38 significant digits there, so it gets
  * DecimalType(38, 10) — capacity for magnitudes/fluxes with exact
  * arithmetic — rather than desdb's f8.
  *
  * Registration is idempotent and package-local ([[register]]);
  * nothing registers at class-load time, so purely-parquet sessions
  * never touch global JDBC state. The dialect itself is stateless.
  */
object DesOracleDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:oracle")

  /** Digits that always fit a signed 64-bit long: 10^18 < 2^63. */
  private val MaxLongDigits = 18

  override def getCatalystType(sqlType: Int, typeName: String,
      size: Int, md: MetadataBuilder): Option[DataType] = sqlType match {
    case Types.NUMERIC | Types.DECIMAL =>
      // Oracle's driver reports NUMBER via NUMERIC with precision in
      // `size` and scale in the metadata (0 precision = unspecified)
      val scale = Option(md).flatMap(m => scala.util.Try(
        m.build().getLong("scale")).toOption).getOrElse(0L).toInt
      Some((size, scale) match {
        // Oracle FLOAT / binary-precision NUMBER: the JDBC driver
        // reports these as NUMERIC with scale = -127 (any precision).
        // They are floating-point by declaration, so a fixed-point
        // DecimalType would silently truncate fractions — stock
        // OracleDialect special-cases this for the same reason.
        case (_, -127)                       => DoubleType
        case (0, _)                          => DecimalType(38, 10)
        case (p, 0) if p <= MaxLongDigits    => LongType
        case (p, s) if s >= 0 && s <= p      => DecimalType(p, s)
        // s > p is legal Oracle (NUMBER(2,5): sub-unity values with 5
        // fraction digits, leading zeros implied) — Spark requires
        // precision >= scale, so widen precision to the scale
        case (p, s) if s > p && s <= 38      => DecimalType(s, s)
        case (_, s) if s > 38                => DecimalType(38, 10)
        // negative scale (NUMBER(p,-s) rounds to tens): widen so the
        // integral magnitude p+|s| fits, capped at Spark's max 38
        case (p, s)                          =>
          DecimalType(math.min(38, p - s), 0)
      })
    case Types.BINARY => Some(BinaryType) // RAW(n)
    case _ if typeName.equalsIgnoreCase("BINARY_DOUBLE") => Some(DoubleType)
    case _ if typeName.equalsIgnoreCase("BINARY_FLOAT")  => Some(FloatType)
    // Oracle DATE has second precision (a timestamp, not a calendar
    // date); TIMESTAMP arrives as Types.TIMESTAMP and needs no help
    case Types.DATE => Some(TimestampType)
    case _ => None
  }

  /** Write path (`quickWrite` analogue): Spark types → Oracle DDL. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case LongType    => Some(JdbcType("NUMBER(19)", Types.NUMERIC))
    case IntegerType => Some(JdbcType("NUMBER(10)", Types.NUMERIC))
    case ShortType   => Some(JdbcType("NUMBER(5)", Types.NUMERIC))
    case ByteType    => Some(JdbcType("NUMBER(3)", Types.NUMERIC))
    case DoubleType  => Some(JdbcType("BINARY_DOUBLE", Types.DOUBLE))
    case FloatType   => Some(JdbcType("BINARY_FLOAT", Types.FLOAT))
    case StringType  => Some(JdbcType("VARCHAR2(4000)", Types.VARCHAR))
    case BooleanType => Some(JdbcType("NUMBER(1)", Types.NUMERIC))
    case BinaryType  => Some(JdbcType("BLOB", Types.BLOB))
    case TimestampType => Some(JdbcType("TIMESTAMP", Types.TIMESTAMP))
    case DateType    => Some(JdbcType("DATE", Types.DATE))
    case d: DecimalType =>
      Some(JdbcType(s"NUMBER(${d.precision},${d.scale})", Types.NUMERIC))
    case _ => None
  }

  @volatile private var registered = false

  /** Idempotent global registration; registered dialects take
    * precedence over Spark's built-ins for matching URLs, so the DES
    * mapping above (not stock OracleDialect) governs a `dessci` read. */
  def register(): Unit = synchronized {
    if (!registered) { JdbcDialects.registerDialect(this); registered = true }
  }
}
