package graft.catalog

import java.sql.Connection

/** Transaction-scoped DDL execution against any JDBC connection — the thin
  * plumbing counterpart of the reference's `db_session_scope`
  * (s3parq session_helper.py:167): run the statements in order inside one
  * transaction, commit on success, roll back and rethrow on any failure,
  * always restore the connection's original autocommit state.
  *
  * graft's catalog layer GENERATES the DDL ([[SpectrumDdl]],
  * `Publish.publishWithCatalog`); this executes it through whatever
  * `java.sql.Connection` the caller owns (Redshift, Postgres, anything
  * JDBC) — no driver dependency, no connection management, mirroring the
  * reference's separation of statement generation from session plumbing.
  */
object DdlExecutor {

  def execute(statements: Seq[String], conn: Connection): Unit = {
    val prevAutoCommit = conn.getAutoCommit
    conn.setAutoCommit(false)
    try {
      val st = conn.createStatement()
      try statements.foreach(st.execute) finally st.close()
      conn.commit()
    } catch {
      case e: Throwable =>
        // rollback failures must not mask the original error
        try conn.rollback() catch { case r: Throwable => e.addSuppressed(r) }
        throw e
    } finally {
      try conn.setAutoCommit(prevAutoCommit) catch { case _: Throwable => () }
    }
  }
}
