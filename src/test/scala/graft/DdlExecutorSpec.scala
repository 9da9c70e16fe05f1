package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, SQLException, Statement}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.DdlExecutor

/** Transaction semantics of the DDL executor against a recording stub
  * connection: statement order, commit on success, rollback + rethrow on
  * failure, autocommit restored either way.
  */
class DdlExecutorSpec extends AnyFunSuite {

  private def stub(log: mutable.Buffer[String], failOn: Option[String]): Connection = {
    val statement = Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[Statement]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "execute" =>
            val sql = args(0).asInstanceOf[String]
            log += s"exec:$sql"
            if (failOn.contains(sql)) throw new SQLException(s"boom on $sql")
            java.lang.Boolean.TRUE
          case "close" => log += "st-close"; null
          case _ => null
        }
      }).asInstanceOf[Statement]
    Proxy.newProxyInstance(getClass.getClassLoader,
      Array[Class[_]](classOf[Connection]), new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = m.getName match {
          case "getAutoCommit" => java.lang.Boolean.TRUE
          case "setAutoCommit" => log += s"autocommit=${args(0)}"; null
          case "createStatement" => statement
          case "commit" => log += "commit"; null
          case "rollback" => log += "rollback"; null
          case _ => null
        }
      }).asInstanceOf[Connection]
  }

  test("executes statements in order inside one committed transaction") {
    val log = mutable.Buffer.empty[String]
    DdlExecutor.execute(Seq("CREATE SCHEMA s", "CREATE TABLE t", "ALTER TABLE t"), stub(log, None))
    assert(log.toSeq == Seq(
      "autocommit=false",
      "exec:CREATE SCHEMA s", "exec:CREATE TABLE t", "exec:ALTER TABLE t",
      "st-close", "commit", "autocommit=true"))
  }

  test("a failing statement rolls back, rethrows, and stops the batch") {
    val log = mutable.Buffer.empty[String]
    val e = intercept[SQLException] {
      DdlExecutor.execute(Seq("A", "B", "C"), stub(log, failOn = Some("B")))
    }
    assert(e.getMessage.contains("boom on B"))
    assert(log.toSeq == Seq(
      "autocommit=false", "exec:A", "exec:B",
      "st-close", "rollback", "autocommit=true"))
    assert(!log.contains("exec:C") && !log.contains("commit"))
  }
}
