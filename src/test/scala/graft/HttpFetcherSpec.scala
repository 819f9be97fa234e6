package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.source.HttpFetcher

/** The S3/S4 HTTP connector policy against a local JDK HttpServer:
  * success, retry-then-success on transient 500s, None after exhausting
  * retries, and header pass-through (reference:
  * PhocusWire/PhocusWireSource.py:58-82).
  */
class HttpFetcherSpec extends AnyFunSuite with Matchers with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = 0
  private val flakyHits = new AtomicInteger(0)
  @volatile private var seenUa: String = ""

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    port = server.getAddress.getPort
    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes("UTF-8")
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/ok", (ex: HttpExchange) => {
      seenUa = Option(ex.getRequestHeaders.getFirst("User-Agent")).getOrElse("")
      respond(ex, 200, "page " + ex.getRequestURI.getQuery)
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      // first two attempts fail, third succeeds
      if (flakyHits.incrementAndGet() % 3 == 0) respond(ex, 200, "recovered")
      else respond(ex, 500, "boom")
    })
    server.createContext("/gone", (ex: HttpExchange) => respond(ex, 404, "nope"))
    server.start()
  }

  override def afterAll(): Unit = server.stop(0)

  private def fetcher(path: String, headers: Map[String, String] = Map.empty) =
    new HttpFetcher(p => s"http://127.0.0.1:$port/$path?pg=$p", headers,
      maxRetries = 3, backoffFactor = 0.01,
      minDelaySeconds = 0.0, maxDelaySeconds = 0.0)

  test("S3: successful fetch returns the body; UA header is sent") {
    val f = fetcher("ok", Map("User-Agent" -> "Mozilla/5.0 (test)"))
    f.fetch(1) shouldBe Some("page pg=1")
    seenUa shouldBe "Mozilla/5.0 (test)"
  }

  test("S3: transient 500s are retried with backoff until success") {
    flakyHits.set(0)
    fetcher("flaky").fetch(1) shouldBe Some("recovered")
    flakyHits.get() shouldBe 3 // two failures + the successful attempt
  }

  test("S3: persistent failure exhausts retries and yields None") {
    fetcher("gone").fetch(1) shouldBe None
  }

  test("S4: politeness delay applies between pages, not before the first") {
    val slow = new HttpFetcher(p => s"http://127.0.0.1:$port/ok?pg=$p",
      Map.empty, maxRetries = 1, backoffFactor = 0.01,
      minDelaySeconds = 0.3, maxDelaySeconds = 0.3)
    val t0 = System.nanoTime()
    slow.fetch(1)
    val firstMs = (System.nanoTime() - t0) / 1e6
    val t1 = System.nanoTime()
    slow.fetch(2)
    val secondMs = (System.nanoTime() - t1) / 1e6
    firstMs should be < 250.0  // no sleep before page 1
    secondMs should be >= 290.0 // ~300ms politeness delay before page 2
  }
}
