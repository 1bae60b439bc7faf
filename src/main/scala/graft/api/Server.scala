package graft.api

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.engine.{QueryEngine, TimeSeriesStore}
import graft.model.QueryError
import org.apache.spark.sql.SparkSession
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Drop-in HTTP facade over the engine, mirroring the reference's
  * servant API (/root/reference/server/src/Api.hs:31-91):
  *
  *   POST   /timeseries        insert `[TS]`        (S1)
  *   PUT    /timeseries        update `[TS]`        (S2)
  *   DELETE /timeseries        delete `[TS']`; `[]` truncates (S3/S4)
  *   POST   /timeseries/query  QueryModel → QueryR  (S5)
  *
  * Success → 200 with JSON; validation/data errors → 400 with the
  * message, like the reference's Handler (Api.hs:78-84). Built on the
  * JDK's HttpServer — zero added dependencies; the engine does the
  * real work, this is ~150 lines of routing and codecs.
  */
final class Server(spark: SparkSession, store: TimeSeriesStore, port: Int) {
  import spark.implicits._

  private val http = HttpServer.create(new InetSocketAddress(port), 0)

  def boundPort: Int = http.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.add("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }


  private def handle(ex: HttpExchange): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val route = (ex.getRequestMethod, ex.getRequestURI.getPath)
    try {
      val result: Either[QueryError, String] = route match {
        case ("POST", "/timeseries/query") =>
          for {
            qm <- QueryJson.parseQueryModel(body)
            df <- QueryEngine.execute(store.current(), qm)
          } yield QueryJson.encodeResult(qm, df)
        case ("POST", "/timeseries") =>
          QueryJson.parseTsBatch(body)
            .flatMap(b => store.insert(b.toDS()))
            .map(_ => "\"OK\"")
        case ("PUT", "/timeseries") =>
          QueryJson.parseTsBatch(body)
            .flatMap(b => store.update(b.toDS()))
            .map(_ => "\"OK\"")
        case ("DELETE", "/timeseries") =>
          QueryJson.parseKeyBatch(body).flatMap {
            case keys if keys.isEmpty => store.truncate(); Right("\"OK\"")
            case keys => store.delete(keys.toDS()).map(_ => "\"OK\"")
          }
        case _ =>
          Left(QueryError.IllegalQuery(s"No route: ${route._1} ${route._2}"))
      }
      result match {
        case Right(json) => respond(ex, 200, json)
        case Left(e) => respond(ex, 400, QueryJson.encodeError(e))
      }
    } catch {
      case e: Throwable => respond(ex, 500, QueryJson.encodeError(
        QueryError.IllegalQuery(String.valueOf(e.getMessage))))
    }
  }

  def start(): Server = {
    http.createContext("/", handle(_))
    http.setExecutor(null) // serialized writer, parity with acid-state
    http.start()
    this
  }

  def stop(): Unit = http.stop(0)
}

/** `sbt "runMain graft.api.ServerMain [port] [storePath]"` */
object ServerMain {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8081)
    val path = args.lift(1).getOrElse("/tmp/graft-store")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val server = new Server(spark, new TimeSeriesStore(spark, path), port).start()
    println(s"[graft] serving on port ${server.boundPort}, store at $path")
    Thread.currentThread().join()
  }
}
