package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.io.{HttpPagedSource, Ingest, PagedSourceConf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** The live-HTTP [[PagedSource]] against a local stub server: the
  * reference's three response envelopes, offset/limit pagination
  * through the partition-per-page ingest, retry-through-5xx, and
  * fail-fast on 4xx. No network leaves the JVM. */
class HttpPagedSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def queryParam(ex: HttpExchange, name: String): Long =
    Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .collectFirst { case Array(k, v) if k == name => v.toLong }.getOrElse(0L)

  /** A paged "markets" dataset of 25 records served in the requested
    * envelope; offset past the end returns an empty page. */
  private def pagedHandler(envelope: String): HttpHandler = (ex: HttpExchange) => {
    val offset = queryParam(ex, "offset")
    val limit = queryParam(ex, "limit")
    val recs = (offset until math.min(offset + limit, 25L))
      .map(i => s"""{"id":$i,"price":${i * 10},"active":${i % 2 == 0}}""")
    val arr = recs.mkString("[", ",", "]")
    val body = envelope match {
      case "bare"     => arr
      case "data"     => s"""{"data":$arr}"""
      case "endpoint" => s"""{"markets":$arr}"""
    }
    respond(ex, 200, body)
  }

  private def withServer(routes: (String, HttpHandler)*)(f: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, h) }
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("price", LongType),
    StructField("active", BooleanType)))

  test("all three reference envelopes parse to the same records") {
    for (env <- Seq("bare", "data", "endpoint")) {
      withServer("/markets" -> pagedHandler(env)) { base =>
        val src = new HttpPagedSource(base, "markets")
        val page = src.fetchPage(0, 10)
        assert(page.size == 10, s"envelope $env")
        assert(page.head.contains("\"id\":0"))
      }
    }
  }

  test("partition-per-page ingest over HTTP: 25 records across 3 pages, typed") {
    withServer("/markets" -> pagedHandler("data")) { base =>
      val src = new HttpPagedSource(base, "markets")
      val df = Ingest.ingest(spark, src, numPages = 3, pageSize = 10, schema)
      assert(df.count() == 25)
      assert(df.agg(sum($"price")).collect()(0).getLong(0) == (0 until 25).map(_ * 10).sum)
      assert(df.schema == schema)
      // past-the-end offsets contribute empty pages, not failures
      val wide = Ingest.ingest(spark, src, numPages = 10, pageSize = 10, schema)
      assert(wide.count() == 25)
    }
  }

  test("5xx retries through; 4xx fails fast") {
    val flaky = new AtomicInteger(0)
    val flakyHandler: HttpHandler = (ex: HttpExchange) =>
      if (flaky.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, """[{"id":1}]""")
    val gone: HttpHandler = (ex: HttpExchange) => respond(ex, 404, "no such endpoint")
    withServer("/flaky" -> flakyHandler, "/gone" -> gone) { base =>
      val src = new HttpPagedSource(base, "flaky", retryBackoffMs = 10L)
      assert(src.fetchPage(0, 10).size == 1, "two 503s then success must succeed")
      assert(flaky.get() == 3)
      val bad = new HttpPagedSource(base, "gone", retryBackoffMs = 10L)
      val e = intercept[java.io.IOException] { bad.fetchPage(0, 10) }
      assert(e.getMessage.contains("404"))
    }
  }

  test("config flag selects the implementation") {
    spark.conf.set("spark.graft.source.mode", "http")
    spark.conf.set("spark.graft.source.url", "http://127.0.0.1:1/")
    spark.conf.set("spark.graft.source.endpoint", "markets")
    try
      assert(PagedSourceConf.fromConf(spark).isInstanceOf[HttpPagedSource])
    finally spark.conf.unset("spark.graft.source.mode")
  }

  test("unrecognized envelope is a named error, not an empty page") {
    val e = intercept[IllegalArgumentException] {
      HttpPagedSource.extractRecords("""{"unexpected": 42}""", "markets")
    }
    assert(e.getMessage.contains("envelope"))
  }
}
