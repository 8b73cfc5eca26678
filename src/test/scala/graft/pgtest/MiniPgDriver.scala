package graft.pgtest

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.{Connection, Driver, DriverManager, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Timestamp, Types}
import java.util.Properties

import scala.collection.mutable.ArrayBuffer

/** TEST-ONLY minimal JDBC driver speaking the PostgreSQL frontend/backend
  * wire protocol v3 (the publicly documented protocol —
  * https://www.postgresql.org/docs/current/protocol.html). This container
  * ships a PostgreSQL SERVER but no client JDBC jar, and nothing can be
  * fetched (zero egress), so without this the live-database integration
  * spec ([[graft.PgIntegrationSpec]]) can never actually run. The driver
  * implements exactly the JDBC surface the engine touches — simple +
  * prepared statements (client-side parameter interpolation), batches,
  * transactions, text-format result sets with the type mapping Spark's
  * JDBC source needs for schema resolution — and fails loudly
  * (SQLFeatureNotSupportedException naming the method) on anything else.
  *
  * Registered via META-INF/services/java.sql.Driver on the TEST classpath
  * only; trust-auth connections only (the sidecar is initdb'ed --auth=trust).
  * Not part of the engine: production deployments use the real pgjdbc.
  */
class MiniPgDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql:")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    // jdbc:postgresql://host:port/db?user=u&k=v
    val re = "jdbc:postgresql://([^:/]+)(?::(\\d+))?/([^?]+)(?:\\?(.*))?".r
    url match {
      case re(host, port, db, query) =>
        val params = Option(query).getOrElse("").split("&").filter(_.contains("="))
          .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
        val user = params.getOrElse("user",
          Option(info).flatMap(p => Option(p.getProperty("user"))).getOrElse("graft"))
        val wire = new PgWire(host, Option(port).map(_.toInt).getOrElse(5432), db, user)
        new PgConnection(wire).asJdbc
      case _ => throw new SQLException(s"unparseable postgres url: $url")
    }
  }

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new SQLFeatureNotSupportedException("getParentLogger")
}

object MiniPgDriver {
  // ServiceLoader registration happens via META-INF/services; this is the
  // belt-and-braces path for callers that Class.forName the driver.
  private val registered = new java.util.concurrent.atomic.AtomicBoolean(false)
  def ensureRegistered(): Unit =
    if (registered.compareAndSet(false, true)) DriverManager.registerDriver(new MiniPgDriver)
  ensureRegistered()
}

/** One column of a RowDescription ('T') message. */
private[pgtest] case class PgCol(name: String, typeOid: Int, typmod: Int)

/** Result of one simple-query round trip: 0+ row sets are collapsed to the
  * last RowDescription seen (our callers send single statements), plus the
  * last CommandComplete tag.
  */
private[pgtest] case class PgResult(cols: Array[PgCol],
    rows: ArrayBuffer[Array[String]], tag: String)

/** Blocking single-threaded protocol client: startup (trust auth only),
  * simple query, terminate. One in-flight query at a time — matching
  * JDBC's one-statement-per-connection execution model.
  */
private[pgtest] class PgWire(host: String, port: Int, db: String, user: String) {
  private val sock = new Socket(host, port)
  sock.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(sock.getOutputStream))
  @volatile var txnStatus: Char = 'I' // I idle, T in txn, E failed txn
  @volatile var closed = false

  startup()
  // session GUCs the text decode relies on: ISO date style, UTC wall
  // clocks, shortest-roundtrip floats
  query("SET DateStyle = 'ISO'; SET TimeZone = 'UTC'; SET extra_float_digits = 3")

  private def cstring(s: String): Array[Byte] = {
    val b = s.getBytes(UTF_8); java.util.Arrays.copyOf(b, b.length + 1)
  }

  private def startup(): Unit = {
    val body = new java.io.ByteArrayOutputStream()
    val d = new DataOutputStream(body)
    d.writeInt(196608) // protocol 3.0
    Seq("user" -> user, "database" -> db, "client_encoding" -> "UTF8",
      "application_name" -> "graft-minipg").foreach { case (k, v) =>
      d.write(cstring(k)); d.write(cstring(v))
    }
    d.writeByte(0)
    out.writeInt(4 + body.size()); body.writeTo(out); out.flush()
    var ready = false
    while (!ready) {
      val (t, payload) = readMessage()
      t match {
        case 'R' =>
          val code = new DataInputStream(new java.io.ByteArrayInputStream(payload)).readInt()
          if (code != 0) throw new SQLException(
            s"only trust auth supported by the test driver (server asked code $code)")
        case 'S' | 'K' | 'N' => () // parameter status / backend key / notice
        case 'Z' => txnStatus = payload(0).toChar; ready = true
        case 'E' => throw decodeError(payload)
        case other => throw new SQLException(s"unexpected startup message '$other'")
      }
    }
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val t = in.readByte().toChar
    val len = in.readInt() - 4
    val payload = new Array[Byte](len)
    in.readFully(payload)
    (t, payload)
  }

  private def decodeError(payload: Array[Byte]): SQLException = {
    var i = 0
    var msg = "unknown error"; var state = ""
    while (i < payload.length && payload(i) != 0) {
      val code = payload(i).toChar; i += 1
      val end = payload.indexOf(0.toByte, i)
      val v = new String(payload, i, end - i, UTF_8)
      if (code == 'M') msg = v
      if (code == 'C') state = v
      i = end + 1
    }
    new SQLException(msg, state)
  }

  /** Simple-query protocol: send 'Q', drain to ReadyForQuery. */
  def query(sql: String): PgResult = synchronized {
    require(!closed, "connection closed")
    val b = sql.getBytes(UTF_8)
    out.writeByte('Q'); out.writeInt(4 + b.length + 1); out.write(b); out.writeByte(0)
    out.flush()
    var cols: Array[PgCol] = Array.empty
    val rows = ArrayBuffer[Array[String]]()
    var tag = ""
    var err: SQLException = null
    var done = false
    while (!done) {
      val (t, payload) = readMessage()
      val d = new DataInputStream(new java.io.ByteArrayInputStream(payload))
      t match {
        case 'T' =>
          val n = d.readShort()
          cols = Array.fill(n) {
            val name = {
              val sb = new StringBuilder
              var c = d.readByte()
              while (c != 0) { sb.append(c.toChar); c = d.readByte() }
              sb.toString
            }
            d.readInt(); d.readShort() // table oid, attnum
            val typeOid = d.readInt()
            d.readShort() // typlen
            val typmod = d.readInt()
            d.readShort() // format (0 = text)
            PgCol(name, typeOid, typmod)
          }
        case 'D' =>
          val n = d.readShort()
          rows += Array.fill(n) {
            val len = d.readInt()
            if (len < 0) null
            else { val v = new Array[Byte](len); d.readFully(v); new String(v, UTF_8) }
          }
        case 'C' =>
          val sb = new StringBuilder
          var c = d.readByte()
          while (c != 0) { sb.append(c.toChar); c = d.readByte() }
          tag = sb.toString
        case 'E' => if (err == null) err = decodeError(payload)
        case 'Z' => txnStatus = payload(0).toChar; done = true
        case 'N' | 'S' | 'I' | 'G' | 'H' | 'W' => () // notice/status/empty/copy
        case other => throw new SQLException(s"unexpected message '$other'")
      }
    }
    if (err != null) throw err
    PgResult(cols, rows, tag)
  }

  def close(): Unit = synchronized {
    if (!closed) {
      closed = true
      try { out.writeByte('X'); out.writeInt(4); out.flush() } catch { case _: Exception => }
      try sock.close() catch { case _: Exception => }
    }
  }
}

/** Proxy plumbing: implement the java.sql interfaces via a handler that
  * answers the methods the engine uses and throws NAMING the method for
  * everything else — an unimplemented path surfaces as a loud test
  * failure, never silent wrong behavior.
  */
private[pgtest] object JdbcProxy {
  def make[T](iface: Class[T], lenient: Boolean = false)(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T = {
    val handler = new InvocationHandler {
      override def invoke(proxy: AnyRef, method: Method, args: Array[AnyRef]): AnyRef = {
        val a = if (args == null) Array.empty[AnyRef] else args
        val key = (method.getName, a)
        if (pf.isDefinedAt(key)) pf(key)
        else method.getName match {
          case "toString" => s"MiniPg(${iface.getSimpleName})"
          case "hashCode" => Int.box(System.identityHashCode(proxy))
          case "equals" => Boolean.box(proxy eq a(0))
          case "isWrapperFor" => Boolean.box(false)
          case "unwrap" => throw new SQLException("unwrap unsupported")
          case name if lenient =>
            defaultFor(method.getReturnType)
          case name =>
            throw new SQLFeatureNotSupportedException(
              s"${iface.getSimpleName}.$name not implemented by the test driver")
        }
      }
    }
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface), handler)
      .asInstanceOf[T]
  }

  private def defaultFor(t: Class[_]): AnyRef = t match {
    case java.lang.Boolean.TYPE => Boolean.box(false)
    case java.lang.Integer.TYPE => Int.box(0)
    case java.lang.Long.TYPE => Long.box(0L)
    case java.lang.Short.TYPE => Short.box(0)
    case java.lang.Byte.TYPE => Byte.box(0)
    case java.lang.Double.TYPE => Double.box(0.0)
    case java.lang.Float.TYPE => Float.box(0.0f)
    case java.lang.Void.TYPE => null
    case c if c == classOf[String] => ""
    case _ => null
  }
}

private[pgtest] class PgConnection(wire: PgWire) {
  @volatile private var autoCommit = true

  private def beginIfNeeded(): Unit =
    if (!autoCommit && wire.txnStatus == 'I') wire.query("BEGIN")

  def exec(sql: String): PgResult = { beginIfNeeded(); wire.query(sql) }

  private def updateCount(tag: String): Int = {
    val parts = tag.split(" ")
    parts.headOption match {
      case Some("INSERT") => parts.last.toInt
      case Some("UPDATE") | Some("DELETE") | Some("COPY") => parts.last.toInt
      case _ => 0
    }
  }

  private def makeStatement(): Statement = {
    var lastResult: PgResult = null
    JdbcProxy.make(classOf[Statement]) {
      case ("execute", Array(sql: String)) =>
        lastResult = exec(sql); Boolean.box(lastResult.cols.nonEmpty)
      case ("executeQuery", Array(sql: String)) =>
        lastResult = exec(sql); new PgResultSet(lastResult).asJdbc
      case ("executeUpdate", Array(sql: String)) =>
        lastResult = exec(sql); Int.box(updateCount(lastResult.tag))
      case ("getResultSet", _) => new PgResultSet(lastResult).asJdbc
      case ("getUpdateCount", _) =>
        Int.box(if (lastResult != null && lastResult.cols.isEmpty)
          updateCount(lastResult.tag) else -1)
      case ("getMoreResults", _) => Boolean.box(false)
      case ("close", _) | ("cancel", _) | ("clearWarnings", _) => null
      case ("setFetchSize", _) | ("setQueryTimeout", _) | ("setMaxRows", _) => null
      case ("getWarnings", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("getConnection", _) => asJdbc
    }
  }

  /** Client-side literal interpolation for '?' placeholders outside
    * single-quoted strings — standard_conforming_strings=on quoting.
    */
  private def interpolate(sql: String, params: Map[Int, AnyRef]): String = {
    val sb = new StringBuilder
    var i = 0; var inStr = false; var n = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { sb.append(c); if (c == '\'') inStr = false }
      else if (c == '\'') { sb.append(c); inStr = true }
      else if (c == '?') {
        n += 1
        val v = params.getOrElse(n,
          throw new SQLException(s"parameter $n not bound"))
        sb.append(literal(v))
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def literal(v: AnyRef): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: Timestamp => "TIMESTAMP '" + t.toString + "'"
    case d: java.sql.Date => "DATE '" + d.toString + "'"
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case d: java.lang.Double =>
      if (d.isNaN) "'NaN'::float8"
      else if (d.isInfinite) (if (d > 0) "'Infinity'::float8" else "'-Infinity'::float8")
      else d.toString
    case f: java.lang.Float => literal(Double.box(f.doubleValue()))
    case n: java.lang.Number => n.toString
    case b: java.math.BigDecimal => b.toPlainString
    case other => throw new SQLException(
      s"test driver cannot bind ${other.getClass.getName}")
  }

  private def makePrepared(sql: String): PreparedStatement = {
    var params = Map[Int, AnyRef]()
    val batch = ArrayBuffer[String]()
    var lastResult: PgResult = null
    def set(i: AnyRef, v: AnyRef): AnyRef = {
      params += (i.asInstanceOf[java.lang.Integer].intValue() -> v); null
    }
    JdbcProxy.make(classOf[PreparedStatement]) {
      case ("setObject", Array(i, v)) => set(i, v)
      case ("setString", Array(i, v)) => set(i, v)
      case ("setTimestamp", Array(i, v)) => set(i, v)
      case ("setDate", Array(i, v)) => set(i, v)
      case ("setDouble", Array(i, v)) => set(i, v)
      case ("setFloat", Array(i, v)) => set(i, v)
      case ("setLong", Array(i, v)) => set(i, v)
      case ("setInt", Array(i, v)) => set(i, v)
      case ("setShort", Array(i, v)) => set(i, v)
      case ("setBoolean", Array(i, v)) => set(i, v)
      case ("setBigDecimal", Array(i, v)) => set(i, v)
      case ("setNull", Array(i, _)) => set(i, null)
      case ("setNull", Array(i, _, _)) => set(i, null)
      case ("clearParameters", _) => params = Map.empty; null
      case ("addBatch", Array()) => batch += interpolate(sql, params); null
      case ("executeBatch", _) =>
        val counts = batch.map(s => updateCount(exec(s).tag)).toArray
        batch.clear()
        counts
      case ("clearBatch", _) => batch.clear(); null
      case ("executeQuery", Array()) =>
        lastResult = exec(interpolate(sql, params))
        new PgResultSet(lastResult).asJdbc
      case ("executeUpdate", Array()) =>
        lastResult = exec(interpolate(sql, params))
        Int.box(updateCount(lastResult.tag))
      case ("execute", Array()) =>
        lastResult = exec(interpolate(sql, params))
        Boolean.box(lastResult.cols.nonEmpty)
      case ("getResultSet", _) => new PgResultSet(lastResult).asJdbc
      case ("getUpdateCount", _) =>
        Int.box(if (lastResult != null && lastResult.cols.isEmpty)
          updateCount(lastResult.tag) else -1)
      case ("getMoreResults", _) => Boolean.box(false)
      case ("close", _) | ("cancel", _) | ("clearWarnings", _) => null
      case ("setFetchSize", _) | ("setQueryTimeout", _) | ("setMaxRows", _) => null
      case ("getWarnings", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("getConnection", _) => asJdbc
    }
  }

  lazy val asJdbc: Connection = JdbcProxy.make(classOf[Connection]) {
    case ("createStatement", _) => makeStatement()
    case ("prepareStatement", args) if args.nonEmpty =>
      makePrepared(args(0).asInstanceOf[String])
    case ("setAutoCommit", Array(b: java.lang.Boolean)) =>
      if (b && !autoCommit && wire.txnStatus != 'I') wire.query("COMMIT")
      autoCommit = b; null
    case ("getAutoCommit", _) => Boolean.box(autoCommit)
    case ("commit", _) =>
      if (wire.txnStatus != 'I') wire.query("COMMIT"); null
    case ("rollback", _) =>
      if (wire.txnStatus != 'I') wire.query("ROLLBACK"); null
    case ("close", _) =>
      // implicit commit of a clean open transaction matches pgjdbc's
      // close-in-transaction behavior closely enough for the spec's
      // autocommit(false) writers, which always commit explicitly anyway
      if (wire.txnStatus == 'T') try wire.query("ROLLBACK") catch { case _: Exception => }
      wire.close(); null
    case ("isClosed", _) => Boolean.box(wire.closed)
    case ("isValid", _) => Boolean.box(!wire.closed)
    case ("setTransactionIsolation", _) | ("setReadOnly", _) |
         ("clearWarnings", _) | ("setCatalog", _) => null
    case ("getTransactionIsolation", _) =>
      Int.box(Connection.TRANSACTION_READ_COMMITTED)
    case ("getWarnings", _) => null
    case ("getCatalog", _) => null
    case ("getMetaData", _) =>
      // lenient: Spark probes assorted capability flags; absent features
      // default to false/0/null rather than aborting the scan
      JdbcProxy.make(classOf[java.sql.DatabaseMetaData], lenient = true) {
        case ("getDatabaseProductName", _) => "PostgreSQL"
        case ("getDatabaseProductVersion", _) => "15"
        case ("getDriverName", _) => "graft-minipg"
        case ("getDriverVersion", _) => "0.1"
        case ("getDatabaseMajorVersion", _) => Int.box(15)
        case ("getDatabaseMinorVersion", _) => Int.box(0)
        case ("getJDBCMajorVersion", _) => Int.box(4)
        case ("getJDBCMinorVersion", _) => Int.box(2)
        case ("getConnection", _) => asJdbc
        case ("supportsTransactions", _) => Boolean.box(true)
      }
  }
}

/** Text-format result set with the OID→JDBC type mapping Spark's schema
  * resolution reads (getColumnType/TypeName/Precision/Scale/isSigned).
  */
private[pgtest] class PgResultSet(r: PgResult) {
  private var pos = -1
  private var lastWasNull = false
  private def cell(i: Int): String = {
    val v = r.rows(pos)(i - 1); lastWasNull = v == null; v
  }
  private val tzSuffix = "([+-]\\d{2}(:\\d{2}){0,2})$".r

  private def toTimestamp(s: String): Timestamp =
    if (s == null) null
    else Timestamp.valueOf(tzSuffix.replaceFirstIn(s, "")) // TimeZone=UTC session

  // oid -> (java.sql.Types code, type name)
  private def typeInfo(oid: Int): (Int, String) = oid match {
    case 16 => (Types.BOOLEAN, "bool")
    case 20 => (Types.BIGINT, "int8")
    case 21 => (Types.SMALLINT, "int2")
    case 23 => (Types.INTEGER, "int4")
    case 700 => (Types.REAL, "float4")
    case 701 => (Types.DOUBLE, "float8")
    case 1700 => (Types.NUMERIC, "numeric")
    case 25 => (Types.VARCHAR, "text")
    case 1043 => (Types.VARCHAR, "varchar")
    case 1042 => (Types.CHAR, "bpchar")
    case 19 => (Types.VARCHAR, "name")
    case 1114 => (Types.TIMESTAMP, "timestamp")
    case 1184 => (Types.TIMESTAMP, "timestamptz")
    case 1082 => (Types.DATE, "date")
    case 17 => (Types.BINARY, "bytea")
    case 26 => (Types.BIGINT, "oid")
    case _ => (Types.VARCHAR, s"oid$oid")
  }

  private def metaData: ResultSetMetaData =
    JdbcProxy.make(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(r.cols.length)
      case ("getColumnName", Array(i)) =>
        r.cols(i.asInstanceOf[java.lang.Integer] - 1).name
      case ("getColumnLabel", Array(i)) =>
        r.cols(i.asInstanceOf[java.lang.Integer] - 1).name
      case ("getColumnType", Array(i)) =>
        Int.box(typeInfo(r.cols(i.asInstanceOf[java.lang.Integer] - 1).typeOid)._1)
      case ("getColumnTypeName", Array(i)) =>
        typeInfo(r.cols(i.asInstanceOf[java.lang.Integer] - 1).typeOid)._2
      case ("getPrecision", Array(i)) =>
        val c = r.cols(i.asInstanceOf[java.lang.Integer] - 1)
        Int.box(c.typeOid match {
          case 1700 if c.typmod >= 4 => ((c.typmod - 4) >> 16) & 0xffff
          case 701 => 17
          case 700 => 8
          case 20 => 19
          case 23 => 10
          case _ => 0
        })
      case ("getScale", Array(i)) =>
        val c = r.cols(i.asInstanceOf[java.lang.Integer] - 1)
        Int.box(c.typeOid match {
          case 1700 if c.typmod >= 4 => (c.typmod - 4) & 0xffff
          case _ => 0
        })
      case ("isSigned", Array(i)) =>
        Boolean.box(Set(20, 21, 23, 700, 701, 1700)
          .contains(r.cols(i.asInstanceOf[java.lang.Integer] - 1).typeOid))
      case ("isNullable", Array(_)) =>
        Int.box(ResultSetMetaData.columnNullable)
      case ("getColumnDisplaySize", Array(_)) => Int.box(32)
      case ("getCatalogName", _) | ("getSchemaName", _) | ("getTableName", _) => ""
      case ("isCaseSensitive", _) | ("isCurrency", _) | ("isAutoIncrement", _) =>
        Boolean.box(false)
    }

  lazy val asJdbc: ResultSet = JdbcProxy.make(classOf[ResultSet]) {
    case ("next", _) =>
      pos += 1; Boolean.box(pos < r.rows.length)
    case ("close", _) => null
    case ("isClosed", _) => Boolean.box(false)
    case ("wasNull", _) => Boolean.box(lastWasNull)
    case ("getMetaData", _) => metaData
    case ("findColumn", Array(label: String)) =>
      val i = r.cols.indexWhere(_.name == label)
      if (i < 0) throw new SQLException(s"no column $label")
      Int.box(i + 1)
    case ("getString", Array(i: java.lang.Integer)) => cell(i)
    case ("getString", Array(label: String)) =>
      cell(r.cols.indexWhere(_.name == label) + 1)
    case ("getLong", Array(i: java.lang.Integer)) =>
      Long.box(Option(cell(i)).map(_.toLong).getOrElse(0L))
    case ("getInt", Array(i: java.lang.Integer)) =>
      Int.box(Option(cell(i)).map(_.toInt).getOrElse(0))
    case ("getShort", Array(i: java.lang.Integer)) =>
      Short.box(Option(cell(i)).map(_.toShort).getOrElse(0: Short))
    case ("getDouble", Array(i: java.lang.Integer)) =>
      Double.box(Option(cell(i)).map(_.toDouble).getOrElse(0.0))
    case ("getFloat", Array(i: java.lang.Integer)) =>
      Float.box(Option(cell(i)).map(_.toFloat).getOrElse(0.0f))
    case ("getBoolean", Array(i: java.lang.Integer)) =>
      Boolean.box(cell(i) == "t")
    case ("getBigDecimal", Array(i: java.lang.Integer)) =>
      Option(cell(i)).map(new java.math.BigDecimal(_)).orNull
    case ("getTimestamp", Array(i: java.lang.Integer)) => toTimestamp(cell(i))
    case ("getTimestamp", Array(i: java.lang.Integer, _)) => toTimestamp(cell(i))
    case ("getDate", Array(i: java.lang.Integer)) =>
      Option(cell(i)).map(java.sql.Date.valueOf).orNull
    case ("getBytes", Array(i: java.lang.Integer)) =>
      Option(cell(i)).map { hex =>
        require(hex.startsWith("\\x"), s"unexpected bytea format: $hex")
        hex.drop(2).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      }.orNull
    case ("getObject", Array(i: java.lang.Integer)) =>
      val c = r.cols(i - 1)
      typeInfo(c.typeOid)._1 match {
        case Types.BIGINT | Types.INTEGER | Types.SMALLINT =>
          Option(cell(i)).map(s => Long.box(s.toLong)).orNull
        case Types.DOUBLE | Types.REAL =>
          Option(cell(i)).map(s => Double.box(s.toDouble)).orNull
        case Types.TIMESTAMP => toTimestamp(cell(i))
        case Types.BOOLEAN => Option(cell(i)).map(s => Boolean.box(s == "t")).orNull
        case _ => cell(i)
      }
    case ("getType", _) => Int.box(ResultSet.TYPE_FORWARD_ONLY)
    case ("setFetchSize", _) | ("clearWarnings", _) => null
    case ("getWarnings", _) => null
  }
}
