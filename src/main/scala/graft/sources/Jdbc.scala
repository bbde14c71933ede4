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

  /** Idempotent epoch write: delete the epoch's previous rows (a retried
    * epoch after a partial failure leaves stragglers), then batched-append
    * the batch tagged with its epoch. foreachBatch is at-least-once; with
    * the epoch scope-delete the sink converges to exactly one copy per
    * epoch for deterministic batches.
    *
    * The table is created by Spark on first append (unquoted identifier —
    * the scope-delete addresses it the same way, so ANSI case folding
    * matches). */
  def writeEpoch(df: DataFrame, url: String, table: String, epochId: Long,
                 props: java.util.Properties = new java.util.Properties,
                 batchSize: Int = 1000): Unit = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      if (tableExists(conn, table)) {
        // Spark's JDBC writer quotes column identifiers at CREATE, so the
        // epoch column is case-sensitive — quote it here too
        val st = conn.prepareStatement(s"""DELETE FROM $table WHERE "epoch" = ?""")
        try { st.setLong(1, epochId); st.executeUpdate(); () } finally st.close()
      }
    } finally conn.close()
    df.withColumn("epoch", lit(epochId))
      .write.mode("append")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
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
