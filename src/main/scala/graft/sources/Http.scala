package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** HTTP JSON extract connector — the reference's extract stage
  * (reference: server.js:33-62 — one fetch per country, launched
  * concurrently; a failed source is logged and SKIPPED, the pipeline
  * continues with the sources that answered).
  *
  * Architecture note (why driver-side): the reference's sources are
  * small JSON API responses (~10³ records each). Fetching on the
  * driver with a concurrent HTTP client is the correct shape for that
  * — a *distributed* fetch would point N executors at one API
  * endpoint for kilobytes of payload. Scale lives downstream: the
  * fetched bodies become a `Dataset[String]` handed to Spark's
  * distributed JSON parser, so schema inference, parsing, and every
  * transform after extract run on the cluster. (Bulk HTTP ingest of
  * many large URLs would instead parallelize the *URL list* across
  * executors — a different operator than this API-extract one.)
  */
object Http {

  /** One endpoint's outcome: either a body or an error message. */
  final case class Fetched(name: String, result: Either[String, String])

  /** Fetch all `(name, url)` endpoints concurrently; never throws —
    * per-endpoint failures (connect errors, timeouts, non-2xx) are
    * captured in the outcome, matching the reference's skip-and-log.
    */
  def fetchAll(endpoints: Seq[(String, String)],
      timeout: Duration = Duration.ofSeconds(10)): Seq[Fetched] = {
    val client = HttpClient.newBuilder()
      .connectTimeout(timeout)
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    // launch every request before joining any: total wall time is the
    // slowest endpoint, not the sum (server.js launches all fetches in
    // one Promise.all)
    val inFlight = endpoints.map { case (name, url) =>
      (name, Try {
        val req = HttpRequest.newBuilder(URI.create(url))
          .timeout(timeout)
          .header("Accept", "application/json")
          .GET().build()
        client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
      })
    }
    inFlight.map {
      case (name, Failure(e)) => Fetched(name, Left(s"request error: ${e.getMessage}"))
      case (name, Success(fut)) =>
        Try(fut.join().asInstanceOf[HttpResponse[String]]) match {
          case Failure(e) => Fetched(name, Left(s"fetch failed: ${e.getMessage}"))
          case Success(resp) if resp.statusCode() / 100 != 2 =>
            Fetched(name, Left(s"HTTP ${resp.statusCode()}"))
          case Success(resp) => Fetched(name, Right(resp.body()))
        }
    }
  }

  /** Fetch N JSON endpoints and union the parsed rows, tagging each
    * row's origin in `tagCol` (the reference tags records with their
    * country). Returns (data, failedSourceNames). Bodies may be a JSON
    * array of objects (the reference's API shape) or JSON-lines —
    * Spark's JSON reader accepts both from a Dataset[String].
    *
    * Partial failure: failed endpoints are skipped and reported;
    * throws only when EVERY endpoint failed (nothing to union —
    * same contract as Pipeline.extract).
    */
  def jsonWithFailures(spark: SparkSession, endpoints: Seq[(String, String)],
      schema: Option[StructType] = None, tagCol: String = "src",
      timeout: Duration = Duration.ofSeconds(10)): (DataFrame, Seq[String]) = {
    val outcomes = fetchAll(endpoints, timeout)
    val failed = outcomes.collect { case Fetched(n, Left(err)) => s"$n: $err" }
    val oks    = outcomes.collect { case Fetched(n, Right(body)) => (n, body) }
    require(oks.nonEmpty, s"all ${endpoints.size} sources failed: ${failed.mkString("; ")}")
    import spark.implicits._
    val parsed = oks.map { case (name, body) =>
      val r = spark.read
      schema.fold(r)(s => r.schema(s)).json(records(body).toDS())
        .withColumn(tagCol, lit(name))
    }
    // sources may expose slightly different field sets; union by name
    // with missing columns nulled, like the reference's tolerant merge
    val df = parsed.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
    (df, outcomes.collect { case Fetched(n, Left(_)) => n })
  }

  /** Split a response body into JSON documents for the Dataset[String]
    * reader (which parses each element as ONE document):
    *
    *   - a JSON array (the reference's API shape) stays one document —
    *     Spark explodes top-level arrays into rows natively;
    *   - JSON-lines (every non-blank line a complete `{...}` object)
    *     becomes one element per line — as a single element only the
    *     first object would parse;
    *   - anything else (e.g. one pretty-printed multi-line object)
    *     stays whole.
    */
  private def records(body: String): Seq[String] = {
    val trimmed = body.trim
    if (trimmed.startsWith("[")) Seq(trimmed)
    else {
      val lines = trimmed.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
      if (lines.length > 1 && lines.forall(l => l.startsWith("{") && l.endsWith("}")))
        lines
      else Seq(trimmed)
    }
  }

  /** Pipeline.source-compatible form: returns just the DataFrame
    * (failures skipped); compose with [[jsonWithFailures]] when the
    * caller needs the failure report.
    */
  def json(spark: SparkSession, endpoints: Seq[(String, String)],
      schema: Option[StructType] = None, tagCol: String = "src",
      timeout: Duration = Duration.ofSeconds(10)): DataFrame =
    jsonWithFailures(spark, endpoints, schema, tagCol, timeout)._1
}
