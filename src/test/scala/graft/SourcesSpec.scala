package graft

import java.nio.file.Files
import graft.sources.LineLoader
import graft.stream.{Alerts, Heartbeat}
import graft.stream.Heartbeat.{NodeEvent, Packet}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** S6 line loader + T6 alert delivery sink. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("line loader numbers lines 1-based in file order") {
    val dir = Files.createTempDirectory("graft_lines")
    val f = dir.resolve("doc.txt")
    Files.writeString(f, "first line\nsecond line\nthird line\n")
    val out = LineLoader.load(spark, f.toString, "doc.txt")
      .orderBy("line_number").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("line") == "first line")
    assert(out(0).getAs[Long]("line_number") == 1L)
    assert(out(2).getAs[String]("line") == "third line")
    assert(out(2).getAs[Long]("line_number") == 3L)
    assert(out.forall(_.getAs[String]("name") == "doc.txt"))
  }

  test("alert sink delivers heartbeat transition events per epoch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_alerts").toString
    val input = MemoryStream[NodeEvent]
    input.addData(NodeEvent(1L, "OFFLINE", 1000L), NodeEvent(2L, "ONLINE", 2000L))
    val sink = new Alerts.MemorySink
    val q = Alerts.deliverStream(input.toDS(), sink, s"$dir/ckpt")
    q.awaitTermination(60000)
    val got = sink.delivered.toArray(Array.empty[NodeEvent]).toSet
    assert(got == Set(NodeEvent(1L, "OFFLINE", 1000L), NodeEvent(2L, "ONLINE", 2000L)))
    assert(Alerts.label(NodeEvent(1L, "OFFLINE", 1000L)).contains("node 1 is OFFLINE"))
  }

  test("alert sink caps an epoch flood: first N delivered + one summary") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_alerts_cap").toString
    val input = MemoryStream[NodeEvent]
    // a "misconfigured threshold" epoch: 25 transitions, cap at 10
    input.addData((1 to 25).map(i => NodeEvent(i.toLong, "OFFLINE", 1000L + i)))
    val sink = new Alerts.MemorySink
    val q = Alerts.deliverStream(input.toDS(), sink, s"$dir/ckpt", maxPerEpoch = 10)
    q.awaitTermination(60000)
    val got = sink.delivered.toArray(Array.empty[NodeEvent]).toSeq
    val (summary, real) = got.partition(_.node == -1L)
    // deterministic head of the at_ms order, not an arbitrary 10
    assert(real.map(_.node).sorted == (1L to 10L))
    assert(summary.map(_.event) == Seq("suppressed 15 more alerts"))
  }

  test("alert sink rejects a non-positive cap up front (r9 ADVICE)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("graft_alerts_zero").toString
    val input = MemoryStream[NodeEvent]
    val sink = new Alerts.MemorySink
    // maxPerEpoch = 0 used to crash mid-epoch on head.last; now it is an
    // explicit configuration error before the stream ever starts
    val e = intercept[IllegalArgumentException] {
      Alerts.deliverStream(input.toDS(), sink, s"$dir/ckpt", maxPerEpoch = 0)
    }
    assert(e.getMessage.contains("maxPerEpoch"))
  }
}
