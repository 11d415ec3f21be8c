package graft

import java.io.PrintWriter
import java.net.ServerSocket

import graft.operators.Ticks
import org.apache.spark.sql.functions._

/** S1 ingest fidelity: the reference's tick source is a live WebSocket
  * (src/gmo/ws-connection.py:99-172) pushing one JSON message per tick;
  * previous rounds stood it in with file replay only. This spec drives
  * the SAME wire-parse operator ([[Ticks.fromWireJson]]) through Spark's
  * real TCP socket streaming source — an actual network byte stream into
  * `readStream`, not a staged file — proving the ingest edge end-to-end:
  * line framing, string-typed price casts, ISO-8601 parse, symbol
  * normalization, and the reference's skip-bad-rows tolerance.
  */
class SocketIngestSpec extends SparkSpec {

  private val wire = Seq(
    """{"symbol":"USD_JPY","timestamp":"2024-01-01T00:00:00.100Z","bid":"151.245","ask":"151.249"}""",
    """{"symbol":"EUR_JPY","timestamp":"2024-01-01T00:00:00.250Z","bid":"160.101","ask":"160.110"}""",
    """this line is not json at all""", // skip-bad-rows: malformed frame
    """{"symbol":"USD_JPY","timestamp":"2024-01-01T00:00:01.000Z","bid":"abc","ask":"151.300"}""", // non-numeric price
    """{"symbol":"USD_JPY","timestamp":"2024-01-01T00:00:02.000Z","bid":"151.260","ask":"151.262"}""")

  test("wire JSON ticks stream through a real TCP socket source") {
    val server = new ServerSocket(0) // ephemeral port
    val port = server.getLocalPort
    @volatile var serverErr: Option[Throwable] = None
    val t = new Thread(() => {
      try {
        val sock = server.accept()
        val out = new PrintWriter(sock.getOutputStream, true)
        wire.foreach(out.println)
        out.flush()
        // keep the connection open: the socket source treats EOF as end
        // of stream mid-query; the test closes it after the assertions
        Thread.sleep(30000)
      } catch { case e: Throwable => serverErr = Some(e) }
    })
    t.setDaemon(true)
    t.start()

    val lines = spark.readStream.format("socket")
      .option("host", "localhost").option("port", port).load()
    val ticks = Ticks.withMid(Ticks.valid(Ticks.fromWireJson(lines)))
    val query = ticks.writeStream.format("memory")
      .queryName("socket_ticks").outputMode("append").start()
    try {
      // socket delivery is asynchronous — poll the sink up to 30 s
      val deadline = System.currentTimeMillis() + 30000
      def sunk() = spark.sql("SELECT * FROM socket_ticks").count()
      while (sunk() < 3 && System.currentTimeMillis() < deadline) {
        query.processAllAvailable()
        Thread.sleep(200)
      }
      val rows = spark.sql(
        "SELECT pair, time, bid, ask, round(mid, 6) AS mid FROM socket_ticks")
        .orderBy("time").collect()
      assert(serverErr.isEmpty, s"server thread failed: $serverErr")
      // 5 wire lines: 1 malformed + 1 non-numeric dropped => 3 ticks
      assert(rows.length === 3, rows.mkString("\n"))
      assert(rows.map(_.getString(0)).toSeq === Seq("USD/JPY", "EUR/JPY", "USD/JPY"))
      assert(rows.head.getTimestamp(1) === ts("2024-01-01 00:00:00.1"))
      assert(rows.head.getDouble(2) === 151.245)
      assert(rows.head.getDouble(3) === 151.249)
      assert(rows.head.getDouble(4) === 151.247)
    } finally {
      query.stop()
      server.close()
    }
  }

  test("fromWireJson is source-agnostic: same parse over a batch frame") {
    import spark.implicits._
    val got = Ticks.valid(Ticks.fromWireJson(wire.toDF("value")))
      .select(col("pair"), unix_millis(col("time")).as("ms"), col("bid"), col("ask"))
      .collect().map(_.toString).sorted
    assert(got.length === 3)
    assert(got.exists(_.contains("EUR/JPY")))
  }
}
