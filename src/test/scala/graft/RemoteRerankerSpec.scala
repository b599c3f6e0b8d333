package graft

import java.io.InputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.rag.{Reranker, RemoteReranker}
import graft.rag.RemoteReranker.Scored

/** Remote-API reranker (reference: ondine/knowledge/reranker.py:79-126
  * JinaReranker). Driven against an in-process loopback rerank service —
  * the same discipline as HttpLlmClientSpec/GraphContextStoreSpec: the
  * SaaS is a base-URL + auth-header concern, the semantics under test are
  * the wire shape, the score-order parse, and the degradation matrix. */
class RemoteRerankerSpec extends SparkSpec {

  private def readBody(is: InputStream): String =
    new String(is.readAllBytes(), StandardCharsets.UTF_8)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private val docs = Seq(
    Scored("d1", "solar panels convert sunlight", 0.9),
    Scored("d2", "wind turbines spin in the breeze", 0.8),
    Scored("d3", "photovoltaic cells and solar electricity", 0.7))

  test("wire shape + score-order parse: out-of-order indices map back and sort by relevance") {
    val seen = new ConcurrentLinkedQueue[(String, String, String)]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/rerank", (ex: HttpExchange) => {
      seen.add((ex.getRequestURI.getPath,
        Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse(""),
        readBody(ex.getRequestBody)))
      // deliberately NOT sorted, and not covering every document — the
      // client must sort by relevance_score and honor the server's top_n
      respond(ex, 200,
        """{"results":[
          |  {"index":1,"relevance_score":0.11},
          |  {"index":2,"relevance_score":0.95},
          |  {"index":0,"relevance_score":0.55}
          |]}""".stripMargin)
    })
    server.start()
    try {
      val r = new RemoteReranker(s"http://127.0.0.1:${server.getAddress.getPort}",
        model = "test-reranker", apiKey = Some("sk-spec"))
      val out = r.rerank("solar power", docs, k = 2)
      assert(out.map(_.id) == Seq("d3", "d1"),
        s"must sort by remote relevance and truncate to k: $out")
      assert(out.map(_.score) == Seq(0.95, 0.55), "scores replaced by remote's")

      val (path, auth, body) = seen.peek()
      assert(path == "/v1/rerank")
      assert(auth == "Bearer sk-spec", "explicit key flows as a Bearer header")
      assert(body.contains("\"model\":\"test-reranker\"") &&
        body.contains("\"query\":\"solar power\"") &&
        body.contains("\"top_n\":2") &&
        body.contains("wind turbines spin in the breeze"),
        s"request must carry model/query/documents/top_n: $body")
    } finally server.stop(0)
  }

  test("degradation matrix: dead port, 5xx, junk body, hostile indices — never throws, never empties") {
    val deadPort = { val s = new java.net.ServerSocket(0)
      val p = s.getLocalPort; s.close(); p }
    val dead = new RemoteReranker(s"http://127.0.0.1:$deadPort", timeoutMs = 500L)
    assert(dead.rerank("q", docs, 2) == docs.take(2),
      "dead endpoint: input order, input scores, truncated to k")
    assert(dead.rerank("q", Nil, 2) == Nil)

    // each failure mode gets its own one-context server
    def degradeCase(name: String, status: Int, body: String): Unit = {
      val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      srv.createContext("/v1/rerank",
        (ex: HttpExchange) => respond(ex, status, body))
      srv.start()
      try {
        val r = new RemoteReranker(s"http://127.0.0.1:${srv.getAddress.getPort}")
        assert(r.rerank("q", docs, 2) == docs.take(2), s"case $name must degrade")
      } finally srv.stop(0)
    }
    degradeCase("5xx", 500, """{"detail":"boom"}""")
    degradeCase("junk body", 200, "this is not json at all {{")
    degradeCase("results not an array", 200, """{"results":"oops"}""")

    // out-of-range + negative indices are DROPPED, the valid one kept
    val hostileSrv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    hostileSrv.createContext("/v1/rerank", (ex: HttpExchange) =>
      respond(ex, 200,
        """{"results":[{"index":99,"relevance_score":1.0},
          |{"index":-1,"relevance_score":0.9},
          |{"index":0,"relevance_score":0.4}]}""".stripMargin))
    hostileSrv.start()
    try {
      val r = new RemoteReranker(
        s"http://127.0.0.1:${hostileSrv.getAddress.getPort}")
      val out = r.rerank("q", docs, 3)
      assert(out == Seq(docs.head.copy(score = 0.4)),
        s"hostile indices dropped, the valid one kept: $out")
    } finally hostileSrv.stop(0)
  }

  test("rerankFrame: remote scores when up; per-query fallback to the local joint scorer when down") {
    import spark.implicits._
    val corpus = Seq(
      ("c1", "solar electricity from photovoltaic panels"),
      ("c2", "wind power from turbines"),
      ("c3", "solar thermal heating water")).toDF("id", "text")
    val queries = Seq(
      ("q-solar", "solar electricity"),
      ("q-wind", "wind turbines")).toDF("query_id", "qtext")
    val candidates = Seq(
      ("q-solar", "c1"), ("q-solar", "c2"), ("q-solar", "c3"),
      ("q-wind", "c1"), ("q-wind", "c2")).toDF("query_id", "id")

    // server that scores ONLY the solar query; wind replies 503 —
    // the mixed up/down matrix in one call
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/rerank", (ex: HttpExchange) => {
      val body = readBody(ex.getRequestBody)
      // key on the QUERY field — document texts appear in both requests
      if (body.contains("\"query\":\"solar electricity\""))
        // docs arrive sorted by id: c1, c2, c3 → score c3 highest
        respond(ex, 200,
          """{"results":[{"index":2,"relevance_score":0.9},
            |{"index":0,"relevance_score":0.8},
            |{"index":1,"relevance_score":0.1}]}""".stripMargin)
      else respond(ex, 503, """{"detail":"shedding load"}""")
    })
    server.start()
    try {
      val remote = new RemoteReranker(
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val out = remote.rerankFrame(candidates, corpus, queries, k = 2)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getDouble(3))).toSeq

      val solar = out.filter(_._1 == "q-solar").sortBy(_._2)
      assert(solar.map(_._3) == Seq("c3", "c1"),
        s"remote order for the served query: $solar")
      assert(solar.map(_._4) == Seq(0.9, 0.8))

      // the failed query must equal the LOCAL joint scorer's output
      val local = Reranker.rerank(
        candidates.filter($"query_id" === "q-wind"), corpus, queries, 2)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
          r.getDouble(3))).toSeq.sortBy(_._2)
      val wind = out.filter(_._1 == "q-wind").sortBy(_._2)
      assert(wind == local,
        s"degraded query must match the local scorer: $wind vs $local")
    } finally server.stop(0)
  }
}
