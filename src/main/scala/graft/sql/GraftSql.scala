package graft.sql

import graft.logs.{HttpdConf, HttpdLog}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graft.Shim
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/**
 * SQL surface parity with the reference extension: exposes
 * `read_httpd_log(path[, format_type[, format_str[, raw]]])` and
 * `read_httpd_conf(path)` as table-valued functions so every query a
 * reference user runs today works verbatim in Spark SQL
 * (reference: src/httpd_log_table_function.cpp:890-900,
 * src/httpd_conf_reader.cpp:300-308):
 *
 * {{{
 * spark.sql("SELECT status, count(*) FROM read_httpd_log('/var/log/access.log', 'common') GROUP BY 1")
 * }}}
 *
 * Wire up either via config (`spark.sql.extensions=graft.sql.GraftExtensions`)
 * or at runtime with `GraftSql.register(spark)`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectTableFunction((
      FunctionIdentifier("read_httpd_log"),
      GraftSql.logInfo,
      GraftSql.readHttpdLogPlan _))
    ext.injectTableFunction((
      FunctionIdentifier("read_httpd_conf"),
      GraftSql.confInfo,
      GraftSql.readHttpdConfPlan _))
  }
}

object GraftSql {

  private[sql] val logInfo = new ExpressionInfo(
    GraftSql.getClass.getCanonicalName, "read_httpd_log",
    "read_httpd_log(path, format_type, format_str, raw) - parses Apache access logs into a table")
  private[sql] val confInfo = new ExpressionInfo(
    GraftSql.getClass.getCanonicalName, "read_httpd_conf",
    "read_httpd_conf(path) - extracts LogFormat/CustomLog/ErrorLogFormat directives")

  /** Register both table functions on an existing session. */
  def register(spark: SparkSession): Unit = {
    Shim.registerTableFunction(spark, "read_httpd_log", logInfo, readHttpdLogPlan)
    Shim.registerTableFunction(spark, "read_httpd_conf", confInfo, readHttpdConfPlan)
  }

  private def strArg(args: Seq[Expression], i: Int, name: String, default: String = ""): String =
    if (args.length <= i) default
    else {
      val e = args(i)
      require(e.foldable, s"read_httpd_log: argument '$name' must be a literal")
      Option(e.eval()).map(_.toString).getOrElse(default)
    }

  private def boolArg(args: Seq[Expression], i: Int, default: Boolean): Boolean =
    if (args.length <= i) default
    else {
      val e = args(i)
      require(e.foldable, "read_httpd_log: 'raw' must be a literal boolean")
      Option(e.eval()).exists(_.toString.toBoolean)
    }

  private[sql] def readHttpdLogPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty, "read_httpd_log requires a path argument")
    val spark = SparkSession.active
    val df = HttpdLog.read(
      spark,
      path = strArg(args, 0, "path"),
      formatType = strArg(args, 1, "format_type"),
      formatStr = strArg(args, 2, "format_str"),
      raw = boolArg(args, 3, default = false))
    Shim.logicalPlan(df)
  }

  private[sql] def readHttpdConfPlan(args: Seq[Expression]): LogicalPlan = {
    require(args.nonEmpty, "read_httpd_conf requires a path argument")
    val spark = SparkSession.active
    Shim.logicalPlan(HttpdConf.read(spark, strArg(args, 0, "path")))
  }
}
