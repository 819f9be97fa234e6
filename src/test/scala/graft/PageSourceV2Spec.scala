package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.extract.{HtmlExtract, Sites}

/** The DataSource V2 paginated streaming source: one page per offset,
  * watermark early-stop inside offset planning — pages past the cutoff
  * are never part of any micro-batch.
  */
class PageSourceV2Spec extends SparkSpec {

  private def skiftEl(slug: String, iso: String) =
    s"""<article><h3 class="c-tease__title"><a href="https://skift.com/$slug/">T $slug</a></h3>
       |<div class="c-tease__byline"><a class="underline">A</a>
       |<time datetime="$iso+00:00"></time></div></article>""".stripMargin

  private def writePages(dir: String, pages: Seq[String]): Unit =
    pages.zipWithIndex.foreach { case (html, i) =>
      Files.writeString(Paths.get(dir, s"page-${i + 1}.html"), html)
    }

  test("micro-batch stream stops at the watermark; later pages never planned") {
    val dir = tmpDir("pages")
    writePages(dir, Seq(
      skiftEl("p1a", "2025-08-03T10:00:00") + skiftEl("p1b", "2025-08-02T09:00:00"),
      skiftEl("p2a", "2025-08-01T08:00:00") + skiftEl("p2b", "2025-07-30T07:00:00"),
      skiftEl("p3a", "2025-08-04T06:00:00"))) // NEWER than watermark, but past
                                              // the stop: must never appear
    val stream = spark.readStream
      .format("paginated-pages")
      .option("pagesDir", dir)
      .option("site", "skift")
      .option("watermark", "2025-08-01 00:00:00")
      .load()
    val q = stream.writeStream
      .format("memory").queryName("pages_v2")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", tmpDir("ckpt-v2"))
      .start()
    q.awaitTermination()
    val rows = spark.table("pages_v2").orderBy("page").collect()
    rows.map(_.getInt(0)).toSeq shouldBe Seq(1, 2) // page 3 never planned
    // composes with the extraction layer downstream
    val arts = HtmlExtract.articles(spark.table("pages_v2"), "html", Sites.skift)
    arts.count() shouldBe 4
    arts.filter(col("News_title") === "T p3a").count() shouldBe 0L
  }

  test("HTTP mode: early-stop means pages past the cutoff are never requested over the wire") {
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val pages = Map(
      1 -> (skiftEl("h1a", "2025-08-03T10:00:00") + skiftEl("h1b", "2025-08-02T09:00:00")),
      2 -> (skiftEl("h2a", "2025-08-01T08:00:00") + skiftEl("h2b", "2025-07-30T07:00:00")),
      3 -> skiftEl("h3a", "2025-08-04T06:00:00")) // past the stop: never requested
    val requested = scala.collection.mutable.ArrayBuffer.empty[String]
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      requested.synchronized { requested += ex.getRequestURI.getPath }
      val page = "/list/(\\d+)".r.findFirstMatchIn(ex.getRequestURI.getPath)
        .map(_.group(1).toInt)
      page.flatMap(pages.get) match {
        case Some(html) =>
          val b = html.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    try {
      val q = spark.readStream.format("paginated-pages")
        .option("urlTemplate", s"http://localhost:${server.getAddress.getPort}/list/%d")
        .option("site", "skift")
        .option("watermark", "2025-08-01 00:00:00")
        .option("minDelaySeconds", "0").option("maxDelaySeconds", "0")
        .option("maxRetries", "1").option("backoffFactor", "0")
        .load()
        .writeStream.format("memory").queryName("pages_http")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", tmpDir("ckpt-http"))
        .start()
      q.awaitTermination()
      spark.table("pages_http").orderBy("page")
        .collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2)
      requested.toSeq shouldBe Seq("/list/1", "/list/2") // page 3: no HTTP request
    } finally server.stop(0)
  }

  test("mid-batch failure after partial sink commit: page refetched, sink exactly-once") {
    // The one streaming-source property the retry/backoff specs don't
    // cover (r12 verdict #6): foreachBatch is at-least-once — a crash
    // BETWEEN the sink write and the checkpoint commit replays the whole
    // offset range on restart, so the same page is fetched twice and the
    // same extracted rows hit the sink twice. Exactly-once downstream
    // must come from the sink's idempotent keyed merge (W3), not from
    // the source. This kills batch 0 right after its merge and proves
    // (a) the replay really re-fetches the page over the wire, and
    // (b) the store converges to one row per article, same bytes.
    import com.sun.net.httpserver.HttpServer
    import java.net.InetSocketAddress
    val pages = Map(
      1 -> (skiftEl("f1a", "2025-08-03T10:00:00") +
        skiftEl("f1b", "2025-08-02T09:00:00")))
    val requested = scala.collection.mutable.ArrayBuffer.empty[String]
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", { ex =>
      requested.synchronized { requested += ex.getRequestURI.getPath }
      val page = "/list/(\\d+)".r.findFirstMatchIn(ex.getRequestURI.getPath)
        .map(_.group(1).toInt)
      page.flatMap(pages.get) match {
        case Some(html) =>
          val b = html.getBytes("UTF-8")
          ex.sendResponseHeaders(200, b.length); ex.getResponseBody.write(b)
        case None => ex.sendResponseHeaders(404, -1)
      }
      ex.close()
    })
    server.start()
    val store = new graft.sink.ArticleStore(spark, tmpDir("v2-fail-store"))
    val ckpt = tmpDir("ckpt-v2-fail")
    val dieAfterMerge = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run(): Option[Throwable] = {
      val q = spark.readStream.format("paginated-pages")
        .option("urlTemplate", s"http://localhost:${server.getAddress.getPort}/list/%d")
        .option("site", "skift")
        .option("watermark", "2025-08-01 00:00:00")
        .option("minDelaySeconds", "0").option("maxDelaySeconds", "0")
        .option("maxRetries", "1").option("backoffFactor", "0")
        .load()
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          store.merge(HtmlExtract.articles(batch, "html", Sites.skift))
          if (dieAfterMerge.getAndSet(false))
            throw new RuntimeException("injected crash after sink commit")
        }
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      try { q.awaitTermination(); None }
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        Some(e) }
    }
    try {
      val failed = run()
      failed.isDefined shouldBe true // batch 0 died AFTER the merge
      // partial commit is visible: the sink already holds the rows
      store.read().count() shouldBe 2
      val snapshot = store.read().drop("Processed_at")
        .collect().map(_.mkString("|")).toSet
      val fetchesBefore = requested.synchronized {
        requested.count(_ == "/list/1") }
      run() shouldBe None // restart: batch 0 replays cleanly
      // (a) the replay went back over the wire for the SAME page
      requested.synchronized {
        requested.count(_ == "/list/1") } should be > fetchesBefore
      // (b) replayed rows merged idempotently — same two articles, same
      // bytes, no duplicates
      store.read().count() shouldBe 2
      store.read().drop("Processed_at")
        .collect().map(_.mkString("|")).toSet shouldBe snapshot
    } finally server.stop(0)
  }

  test("batch boundaries respect offsets across restarts (checkpointed)") {
    val dir = tmpDir("pages2")
    writePages(dir, Seq(skiftEl("q1", "2025-08-03T10:00:00")))
    val ckpt = tmpDir("ckpt-v2b")
    val out = tmpDir("out-v2b")
    def run(): Unit = {
      val q = spark.readStream.format("paginated-pages")
        .option("pagesDir", dir).option("site", "skift")
        .option("watermark", "2025-08-01 00:00:00")
        .load()
        .writeStream.format("parquet").option("path", out)
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .start()
      q.awaitTermination()
    }
    run()
    spark.read.parquet(out).count() shouldBe 1
    // second invocation: a new page appeared; only IT is newly processed
    // (page 1's committed offset is honored across the restart)
    Files.writeString(Paths.get(dir, "page-2.html"),
      skiftEl("q2", "2025-08-02T10:00:00"))
    run()
    spark.read.parquet(out).select("page").orderBy("page")
      .collect().map(_.getInt(0)).toSeq shouldBe Seq(1, 2)
  }
}
