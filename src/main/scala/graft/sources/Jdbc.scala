package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relational sink plumbing (SURVEY.md §2.1 S4 deployment form) — the Spark
  * counterpart of the reference's per-row psycopg2 INSERT loop
  * (AIRWISEv0.py:159-234), but batched (one prepared statement per
  * `batchsize` rows), parallel (one connection per partition) and
  * idempotent per epoch instead of one connection per message.
  */
object Jdbc {

  /** Conservative identifier shape — table names are code-owned, never
    * data-derived, so anything outside this alphabet is a bug (and would
    * otherwise be interpolated into DDL/DML unescaped). */
  private val Ident = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Idempotent epoch write via a staged atomic swap. foreachBatch is
    * at-least-once, so the write must converge to exactly one copy per
    * epoch AND never pass through a state where a committed epoch's rows
    * are missing from the visible table:
    *
    *  1. the batch (tagged with its epoch) is appended to `<table>_stage`
    *     — parallel, one connection per partition, batched statements;
    *     stragglers from a previously failed attempt are scope-deleted
    *     from the stage first;
    *  2. ONE connection then runs delete-old + insert-from-stage + clear-
    *     stage as a SINGLE transaction — a crash anywhere rolls back and
    *     leaves the visible table exactly as it was (the r2 form deleted
    *     on one connection and appended on another, so a failure between
    *     them lost the epoch until a retry happened).
    *
    * Both tables are created by Spark's JDBC writer from the same schema,
    * so column DDL order matches; the insert still names columns
    * explicitly (Spark quotes identifiers at CREATE, so the quoted
    * spellings match exactly). */
  def writeEpoch(df: DataFrame, url: String, table: String, epochId: Long,
                 props: java.util.Properties = new java.util.Properties,
                 batchSize: Int = 1000): Unit = {
    require(Ident.matches(table), s"illegal table identifier: $table")
    val stage = s"${table}_stage"
    val tagged = df.withColumn("epoch", lit(epochId))
    // ensure the visible table exists with the batch's schema (no rows)
    tagged.limit(0).write.mode("append").jdbc(url, table, props)
    // clear this epoch's stage stragglers from a previously failed attempt
    withConn(url, props) { conn =>
      if (tableExists(conn, stage)) {
        val st = conn.prepareStatement(s"""DELETE FROM $stage WHERE "epoch" = ?""")
        try { st.setLong(1, epochId); st.executeUpdate(); () } finally st.close()
      }
    }
    // parallel batched load into the stage (creates it on first epoch)
    tagged.write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, stage, props)
    // atomic swap: old epoch out, staged epoch in, stage cleared — one txn
    val cols = tagged.schema.fieldNames.map(c => s""""$c"""").mkString(", ")
    withConn(url, props) { conn =>
      conn.setAutoCommit(false)
      try {
        execUpdate(conn, s"""DELETE FROM $table WHERE "epoch" = ?""", epochId)
        execUpdate(conn,
          s"""INSERT INTO $table ($cols) SELECT $cols FROM $stage WHERE "epoch" = ?""",
          epochId)
        execUpdate(conn, s"""DELETE FROM $stage WHERE "epoch" = ?""", epochId)
        conn.commit()
      } catch {
        case t: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw t
      }
    }
  }

  private def withConn[A](url: String, props: java.util.Properties)
                         (f: java.sql.Connection => A): A = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def execUpdate(conn: java.sql.Connection, sql: String, epochId: Long): Unit = {
    val st = conn.prepareStatement(sql)
    try { st.setLong(1, epochId); st.executeUpdate(); () } finally st.close()
  }

  private def tableExists(conn: java.sql.Connection, table: String): Boolean = {
    val md = conn.getMetaData
    // unquoted identifiers fold per the database's rule (Derby/Postgres
    // differ) — probe the folded spellings
    Seq(table, table.toUpperCase(java.util.Locale.ROOT),
        table.toLowerCase(java.util.Locale.ROOT)).distinct.exists { t =>
      val rs = md.getTables(null, null, t, null)
      try rs.next() finally rs.close()
    }
  }
}
