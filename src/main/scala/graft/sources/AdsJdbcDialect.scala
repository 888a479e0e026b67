package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._

/** The Oracle/Snowflake NUMBER-family type contract the reference pipeline
  * depends on, encoded as a Spark `JdbcDialect` so the same semantics ride
  * `Sources.readJdbc`/`writeJdbc` instead of per-row Python coercions:
  *
  *  - `NUMBER` (scale 0) ids/counts → `LongType` — the reference pushes
  *    every id/count through `int()` before binding
  *    (`scripts/oracle_to_snowflake.py:89-99`);
  *  - `NUMBER(10,2)` money → `DecimalType(10,2)` — the staging DDL's SPEND
  *    column (`scripts/oracle_to_snowflake.py:71`, `README.md:114`);
  *  - `DATE` → `DateType` stays Spark's default mapping; the reference's
  *    `TO_DATE(:4,'YYYY-MM-DD')` binds (`scripts/insert_ads_data.py:40`)
  *    are day-precision date binds, which is exactly what Spark's
  *    `setDate` does.
  *
  * Emitted DDL types are spelled in the ANSI `DECIMAL` form every
  * NUMBER-family warehouse (and embedded Derby, the test stand-in)
  * accepts; Oracle/Snowflake treat NUMBER and DECIMAL as synonyms. The
  * dialect activates on URLs carrying the `graft-ads` marker so it shadows
  * the built-in dialect only for connections that opt in.
  */
object AdsJdbcDialect extends JdbcDialect {

  override def canHandle(url: String): Boolean = url.contains("graft-ads")

  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] = sqlType match {
    case Types.NUMERIC | Types.DECIMAL =>
      val scale =
        if (md == null) 0
        else scala.util.Try(md.build().getLong("scale").toInt).getOrElse(0)
      // NUMBER with no fractional digits is an id/count (the int() path).
      // The long mapping stops at precision 18: every 18-digit integer
      // fits a long, while NUMBER(19) can hold values past Long.MaxValue
      // — those stay decimal so nothing can overflow at read time
      if (scale == 0 && size > 0 && size <= 18) Some(LongType)
      else if (size > 0) Some(DecimalType(math.min(size, DecimalType.MAX_PRECISION), scale))
      else None
    case _ => None // DATE, VARCHAR, …: Spark's defaults are the contract
  }

  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    // DECIMAL(18,0), not 19: it round-trips back to LongType (see
    // getCatalystType), and an id/count beyond 18 digits is outside the
    // ads domain — such a write fails loudly at insert rather than
    // landing in a column the read path would have to widen
    case LongType => Some(JdbcType("DECIMAL(18,0)", Types.NUMERIC))
    case d: DecimalType =>
      Some(JdbcType(s"DECIMAL(${d.precision},${d.scale})", Types.NUMERIC))
    case DoubleType => Some(JdbcType("DOUBLE", Types.DOUBLE)) // Snowflake FLOAT
    case _ => None
  }

  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Idempotently register with Spark's dialect registry (prepends, so it
    * wins over the built-in dialect for matching URLs).
    */
  def register(): Unit =
    if (registered.compareAndSet(false, true)) JdbcDialects.registerDialect(this)
}
