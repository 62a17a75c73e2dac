package graft

import java.io.OutputStream
import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.api.Pipeline
import graft.sources.Http
import org.apache.spark.sql.functions._

/** HTTP extract connector against a local stub server (no external
  * network): mirrors the reference's extract semantics — N endpoints
  * fetched concurrently, failures skipped and reported, survivors
  * unioned (server.js:33-62).
  */
class HttpSpec extends SparkSpec {

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def withServer[A](routes: Map[String, HttpExchange => Unit])(f: Int => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, (ex: HttpExchange) => h(ex)) }
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  private val routes = Map[String, HttpExchange => Unit](
    // the reference's API shape: a JSON array of objects
    "/us" -> (respond(_, 200,
      """[{"name":"MIT","country":"United States","web_pages":["mit.edu"]},
         {"name":"Stanford","country":"United States","web_pages":["stanford.edu"]}]""")),
    // JSON-lines also parses
    "/ca" -> (respond(_, 200,
      """{"name":"Toronto","country":"Canada","web_pages":["utoronto.ca"]}
         {"name":"McGill","country":"Canada","web_pages":["mcgill.ca"]}""")),
    "/boom" -> (respond(_, 500, """{"error":"upstream down"}""")))

  test("concurrent fetch unions sources, skips and reports the failing one") {
    withServer(routes) { port =>
      val base = s"http://127.0.0.1:$port"
      val (df, failed) = Http.jsonWithFailures(spark, Seq(
        "us"   -> s"$base/us",
        "ca"   -> s"$base/ca",
        "boom" -> s"$base/boom",                      // HTTP 500 → skipped
        "gone" -> "http://127.0.0.1:1/nope"))         // connect refused → skipped
      assert(failed.sorted == Seq("boom", "gone"))
      val rows = df.select("name", "country", "src").collect()
      assert(rows.length == 4)
      assert(rows.map(_.getString(2)).toSet == Set("us", "ca"))
      assert(df.filter(col("src") === "us").count() == 2)
    }
  }

  test("all endpoints failing raises (same contract as Pipeline.extract)") {
    val e = intercept[IllegalArgumentException] {
      Http.jsonWithFailures(spark, Seq("a" -> "http://127.0.0.1:1/a"))
    }
    assert(e.getMessage.contains("all 1 sources failed"))
  }

  test("wires into Pipeline as a source: extract -> transform -> count") {
    withServer(routes) { port =>
      val base = s"http://127.0.0.1:$port"
      val result = Pipeline.builder(spark)
        .source("universities")(s => Http.json(s, Seq(
          "us" -> s"$base/us", "ca" -> s"$base/ca")))
        .transform(df => operators.Clean.requireFields(df, Seq("name", "country")))
        .sink("noop")(_ => ())
        .refresh()
      assert(result.recordCount == 4)
      assert(result.failedSources.isEmpty)
    }
  }
}
