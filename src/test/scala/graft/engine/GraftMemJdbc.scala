package graft.engine

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Driver, DriverManager, SQLException}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** In-memory JDBC driver double registered under `jdbc:graft:` — lets
  * `Sink.write`'s jdbc branch EXECUTE offline (no database jar exists in
  * this environment), recording exactly what Spark's JDBC writer sends:
  * the CREATE TABLE DDL, every inserted row, per-`executeBatch` sizes
  * (proving the batchsize option wiring), and any transaction-isolation
  * calls (proving isolationLevel=NONE suppresses them).
  *
  * Built as reflective proxies over the java.sql interfaces: unknown
  * methods return type-default values; only the handful of calls the
  * Spark writer makes are given real behavior. Test scope only.
  */
object GraftMemJdbc {
  val UrlPrefix = "jdbc:graft:"

  // recorded state (executors share the JVM in local mode)
  val rows = new ConcurrentLinkedQueue[Seq[Any]]()
  val batchSizes = new ConcurrentLinkedQueue[Integer]()
  val ddl = new ConcurrentLinkedQueue[String]()
  val isolationCalls = new ConcurrentLinkedQueue[Integer]()
  @volatile var connectedUrl: String = _

  def reset(): Unit = {
    rows.clear(); batchSizes.clear(); ddl.clear(); isolationCalls.clear()
    connectedUrl = null
    createdCols = null
  }

  def insertedRows: Seq[Seq[Any]] = rows.asScala.toSeq
  def batches: Seq[Int] = batchSizes.asScala.toSeq.map(_.intValue)

  private def dflt(m: Method): AnyRef = m.getReturnType match {
    case java.lang.Boolean.TYPE => java.lang.Boolean.FALSE
    case java.lang.Integer.TYPE => Integer.valueOf(0)
    case java.lang.Long.TYPE => java.lang.Long.valueOf(0L)
    case java.lang.Void.TYPE => null
    case _ => null
  }

  private def proxy(iface: Class[_])(
      pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): AnyRef =
    Proxy.newProxyInstance(iface.getClassLoader, Array(iface),
      new InvocationHandler {
        override def invoke(p: Any, m: Method,
                            args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          pf.applyOrElse((m.getName, a),
            (_: (String, Array[AnyRef])) => dflt(m))
        }
      })

  /** (name, java.sql.Types id, type name) per column of the table the
    * writer CREATEd — parsed from its own DDL so post-create schema
    * probes can answer.
    */
  @volatile private var createdCols: Seq[(String, Int, String)] = _

  private def parseDdl(sql: String): Unit = {
    val body = sql.substring(sql.indexOf('(') + 1, sql.lastIndexOf(')'))
    createdCols = body.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
      .map { colDef =>
        val Array(rawName, rawType) = colDef.split("\\s+", 2)
        val name = rawName.stripPrefix("\"").stripSuffix("\"")
        val t = rawType.trim.toUpperCase
        val (id, tn) =
          if (t.startsWith("BIGINT")) (java.sql.Types.BIGINT, "BIGINT")
          else if (t.startsWith("INTEGER")) (java.sql.Types.INTEGER, "INTEGER")
          else if (t.startsWith("DOUBLE")) (java.sql.Types.DOUBLE, "DOUBLE")
          else if (t.startsWith("TIMESTAMP"))
            (java.sql.Types.TIMESTAMP, "TIMESTAMP")
          else (java.sql.Types.VARCHAR, "TEXT")
        (name, id, tn)
      }
  }

  private def emptyResultSet(): AnyRef = {
    val cols = createdCols
    val rsmd = proxy(classOf[java.sql.ResultSetMetaData]) {
      case ("getColumnCount", _) => Integer.valueOf(cols.length)
      case ("getColumnLabel" | "getColumnName", a) =>
        cols(a(0).asInstanceOf[Integer].intValue - 1)._1
      case ("getColumnType", a) =>
        Integer.valueOf(cols(a(0).asInstanceOf[Integer].intValue - 1)._2)
      case ("getColumnTypeName", a) =>
        cols(a(0).asInstanceOf[Integer].intValue - 1)._3
      case ("isSigned", _) => java.lang.Boolean.TRUE
      case ("isNullable", _) =>
        Integer.valueOf(java.sql.ResultSetMetaData.columnNullable)
    }
    proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) => java.lang.Boolean.FALSE
      case ("getMetaData", _) => rsmd
    }
  }

  private def newPrepared(sql: String): AnyRef = {
    val current = new java.util.HashMap[Int, Any]()
    var pending = 0
    proxy(classOf[java.sql.PreparedStatement]) {
      case ("executeQuery", _) =>
        // existence/schema probes arrive as prepared SELECTs: before the
        // writer has CREATEd the table report "no such table"
        // (SQLState 42* = object-not-found for the default dialect);
        // after, an empty result set whose metadata mirrors the DDL
        if (createdCols == null)
          throw new SQLException(s"graft-mem: no such table ($sql)", "42S02")
        else emptyResultSet()
      case ("executeUpdate", _) =>
        ddl.add(sql)
        if (sql.trim.toUpperCase.startsWith("CREATE TABLE")) parseDdl(sql)
        Integer.valueOf(0)
      case (set, a) if set.startsWith("set") && a.length >= 2 &&
          a(0).isInstanceOf[Integer] &&
          set != "setQueryTimeout" && set != "setFetchSize" =>
        // setLong/setString/setNull/... (i, value) — 1-based index
        current.put(a(0).asInstanceOf[Integer].intValue,
          if (set == "setNull") null else a(1))
        null
      case ("addBatch", _) =>
        val n = current.keySet.asScala.map(_.intValue).maxOption.getOrElse(0)
        rows.add((1 to n).map(current.get(_)))
        pending += 1
        null
      case ("executeBatch", _) =>
        batchSizes.add(pending)
        val out = Array.fill(pending)(1)
        pending = 0
        out
    }
  }

  private def newStatement(): AnyRef =
    proxy(classOf[java.sql.Statement]) {
      case ("executeQuery", _) =>
        if (createdCols == null)
          throw new SQLException("graft-mem: table does not exist", "42S02")
        else emptyResultSet()
      case ("executeUpdate", a) =>
        val sql = String.valueOf(a(0))
        ddl.add(sql)
        if (sql.trim.toUpperCase.startsWith("CREATE TABLE")) parseDdl(sql)
        Integer.valueOf(0)
    }

  private def newMetaData(): AnyRef =
    proxy(classOf[java.sql.DatabaseMetaData]) {
      case ("getURL", _) => connectedUrl
      case ("getDatabaseProductName", _) => "GraftMem"
      case ("getIdentifierQuoteString", _) => "\""
      // both transaction-capability probes say NO -> the writer must
      // skip autocommit/isolation management entirely
    }

  private def newConnection(url: String): AnyRef = {
    connectedUrl = url
    proxy(classOf[java.sql.Connection]) {
      case ("createStatement", _) => newStatement()
      case ("prepareStatement", a) => newPrepared(String.valueOf(a(0)))
      case ("getMetaData", _) => newMetaData()
      case ("setTransactionIsolation", a) =>
        isolationCalls.add(a(0).asInstanceOf[Integer]); null
      case ("getAutoCommit", _) => java.lang.Boolean.TRUE
    }
  }

  private[engine] def connection(url: String): java.sql.Connection =
    newConnection(url).asInstanceOf[java.sql.Connection]

  private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      DriverManager.registerDriver(new GraftMemDriver)
      registered = true
    }
  }
}

/** A REAL class (not a proxy): Spark's DriverRegistry resolves the
  * driver's class name from DriverManager and re-instantiates it via a
  * no-arg constructor on each connection factory.
  */
class GraftMemDriver extends Driver {
  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith(GraftMemJdbc.UrlPrefix)
  override def connect(url: String,
                       info: java.util.Properties): java.sql.Connection =
    if (acceptsURL(url)) GraftMemJdbc.connection(url) else null
  override def getMajorVersion: Int = 1
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(url: String, info: java.util.Properties)
      : Array[java.sql.DriverPropertyInfo] = Array.empty
  override def getParentLogger: java.util.logging.Logger =
    java.util.logging.Logger.getGlobal
}
