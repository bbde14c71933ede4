package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.stream.Ingest
import graft.model.Schemas

/** S3 deployment transport: the TCP line source feeds the IDENTICAL
  * downstream plan as the MemoryStream/file path (IngestStreamSpec) — this
  * spec proves the deployment shape end-to-end: a real socket server, a
  * real streaming query, routed epoch-idempotent parquet out. */
class SocketIngestSpec extends SparkSpec {
  import spark.implicits._

  test("socket transport feeds the identical ingest plan end-to-end") {
    val dir = Files.createTempDirectory("graft_socket").toString
    // loopback server on an ephemeral port, up BEFORE the query starts
    val server = new java.net.ServerSocket(0, 1,
      java.net.InetAddress.getLoopbackAddress)
    val port = server.getLocalPort
    val feeder = new Thread(() => {
      val s = server.accept()
      val out = new java.io.PrintWriter(s.getOutputStream, true)
      out.println("""{"from":1127718912,"payload":{"barometric_pressure":1013.2,"gas_resistance":120000.5,"iaq":51,"relative_humidity":40.2,"temperature":21.5},"timestamp":1760748340,"type":"telemetry"}""")
      out.println("""{"from":1127718912,"payload":{"battery_level":92,"voltage":4.01},"timestamp":1760748350,"type":"telemetry"}""")
      out.println("garbage that is not json")
      // connection stays open until the test closes the server: the socket
      // source treats EOF as stream end
    })
    feeder.setDaemon(true)
    feeder.start()

    val dim = Schemas.nodeDimSeed.toDF("node", "topic_id", "longname")
    val q = Ingest.runIngestSocket(spark, "127.0.0.1", port, dim,
      s"$dir/out", s"$dir/ckpt")
    try {
      // poll the sink (arrival is asynchronous — processAllAvailable can
      // return between the connect and the first delivered line)
      val deadline = System.currentTimeMillis() + 60000
      def envRows() =
        try spark.read.parquet(s"$dir/out/airwise_data").count()
        catch { case _: Throwable => 0L }
      def batRows() =
        try spark.read.parquet(s"$dir/out/battery_data").count()
        catch { case _: Throwable => 0L }
      while ((envRows() < 1 || batRows() < 1) &&
        System.currentTimeMillis() < deadline) Thread.sleep(250)
      assert(envRows() == 1, "environment telemetry routed")
      assert(batRows() == 1, "battery telemetry routed")
      val env = spark.read.parquet(s"$dir/out/airwise_data")
      // identical downstream semantics: enrichment + day partitioning
      assert(env.collect().head.getAs[String]("longname") == "Farm1")
      assert(env.columns.contains("ds"))
    } finally {
      q.stop()
      server.close()
    }
  }
}
