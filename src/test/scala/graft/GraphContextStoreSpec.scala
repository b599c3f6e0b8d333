package graft

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.verify.GraphContextStore

/** Cloud graph context backend driven over the real HTTP wire against an
  * in-process graph service (the HttpLlmClientSpec / MiniRedis
  * discipline): create idempotency incl. 409, [TYPE]-formatted adds,
  * edge/node search parsing, and the reference's degradation contract
  * (no key / dead server / malformed replies never fail the caller). */
class GraphContextStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var port: Int = _
  private val mapper = new ObjectMapper()

  /** graphId -> stored texts, in order. */
  private val graphs = new ConcurrentHashMap[String, java.util.List[String]]()
  private val createCalls = new AtomicInteger(0)
  private val flakyFailedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, bytes.length)
    val os: OutputStream = ex.getResponseBody
    os.write(bytes); os.close()
  }

  private def authorized(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains("Api-Key test-key")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val path = ex.getRequestURI.getPath
      if (!authorized(ex)) respond(ex, 401, """{"error":"unauthorized"}""")
      else if (path == "/graph") {
        createCalls.incrementAndGet()
        val id = mapper.readTree(body).path("graph_id").asText
        if (id == "flaky-g" && !flakyFailedOnce.getAndSet(true))
          respond(ex, 500, """{"error":"transient"}""")
        else if (graphs.containsKey(id))
          respond(ex, 409, """{"error":"graph already exists"}""")
        else {
          graphs.put(id, java.util.Collections.synchronizedList(
            new java.util.ArrayList[String]()))
          respond(ex, 201, s"""{"graph_id":"$id"}""")
        }
      } else if (path.endsWith("/add")) {
        val id = path.split("/")(2)
        Option(graphs.get(id)) match {
          case Some(list) =>
            list.add(mapper.readTree(body).path("data").asText)
            respond(ex, 202, """{"status":"queued"}""")
          case None => respond(ex, 404, """{"error":"no such graph"}""")
        }
      } else if (path.endsWith("/search")) {
        val id = path.split("/")(2)
        val q = mapper.readTree(body).path("query").asText.toLowerCase
        val limit = mapper.readTree(body).path("limit").asInt(5)
        val texts = Option(graphs.get(id))
          .map(l => l.toArray(Array.empty[String]).toSeq).getOrElse(Nil)
        // naive relevance: fraction of query words present in the fact
        val words = q.split("\\s+").filter(_.nonEmpty)
        val edges = texts.map { t =>
          val score =
            if (words.isEmpty) 0.0
            else words.count(t.toLowerCase.contains).toDouble / words.length
          (t, score)
        }.filter(_._2 > 0).sortBy(-_._2).take(limit)
        val root = mapper.createObjectNode()
        val arr = root.putArray("edges")
        edges.zipWithIndex.foreach { case ((t, s), i) =>
          val e = arr.addObject()
          e.put("fact", t); e.put("score", s); e.put("name", s"edge-$i")
        }
        root.putArray("nodes")
        respond(ex, 200, mapper.writeValueAsString(root))
      } else respond(ex, 404, "{}")
    })
    server.start()
    port = server.getAddress.getPort
  }

  override def afterAll(): Unit = server.stop(0)

  private def base = s"http://127.0.0.1:$port"

  test("store formats [TYPE] text, search returns scored edges in rank order") {
    GraphContextStore.resetEnsuredGraphs()
    val s = new GraphContextStore(base, "run-1", Some("test-key"))
    assert(s.available)
    val id = s.store("the sky is blue", "factual")
    s.store("grass is green", "factual")
    s.store("the ocean is blue and deep", "observation")
    // remote side saw the reference's formatted shape
    assert(graphs.get("run-1").get(0) == "[FACTUAL] the sky is blue")
    assert(graphs.get("run-1").get(2) == "[OBSERVATION] the ocean is blue and deep")
    // local retrieval answers without the network (reference semantics)
    assert(s.retrieve(id).contains(("the sky is blue", "factual")))
    val hits = s.search("blue sky", limit = 2)
    assert(hits.length == 2)
    assert(hits.head.text.contains("sky is blue")) // both words hit
    assert(hits.head.score >= hits(1).score)
    assert(hits.forall(_.sourceRef.startsWith("edge-")))
  }

  test("graph creation is idempotent per JVM and tolerates 409 races") {
    GraphContextStore.resetEnsuredGraphs()
    val before = createCalls.get()
    new GraphContextStore(base, "shared-graph", Some("test-key"))
    new GraphContextStore(base, "shared-graph", Some("test-key"))
    // second instance reuses the JVM cache: exactly one create round trip
    assert(createCalls.get() == before + 1)
    // a "fresh JVM" retries the create and must absorb the 409
    GraphContextStore.resetEnsuredGraphs()
    val s = new GraphContextStore(base, "shared-graph", Some("test-key"))
    assert(createCalls.get() == before + 2)
    assert(s.store("still works after 409") != null)
  }

  test("no API key: present-but-inactive, local cache still serves") {
    val s = new GraphContextStore(base, "keyless", None)
    assert(!s.available)
    val id = s.store("kept locally", "factual")
    assert(s.retrieve(id).contains(("kept locally", "factual")))
    assert(s.search("kept") == Nil)
    assert(!graphs.containsKey("keyless")) // nothing ever sent
    // a set-but-BLANK key is absent, not an active backend that 401s
    assert(!new GraphContextStore(base, "keyless", Some("")).available)
  }

  test("close deactivates the backend: no further remote I/O") {
    GraphContextStore.resetEnsuredGraphs()
    val s = new GraphContextStore(base, "closing", Some("test-key"))
    s.store("before close")
    assert(graphs.get("closing").size == 1)
    s.close()
    assert(!s.available)
    s.store("after close")
    assert(graphs.get("closing").size == 1) // nothing sent post-close
    assert(s.search("before") == Nil)
  }

  test("a failed create is retried by the next instance, not cached as done") {
    GraphContextStore.resetEnsuredGraphs()
    // first create 500s — a transient outage must NOT poison the JVM cache
    new GraphContextStore(base, "flaky-g", Some("test-key"))
    assert(!graphs.containsKey("flaky-g"))
    // next instance, same endpoint+graph: the create is retried and lands
    val s = new GraphContextStore(base, "flaky-g", Some("test-key"))
    s.store("made it")
    assert(graphs.containsKey("flaky-g"))
    assert(graphs.get("flaky-g").size == 1)
  }

  test("dead server and malformed replies degrade, never throw") {
    GraphContextStore.resetEnsuredGraphs()
    // unreachable port: constructor, store and search all survive
    val dead = new GraphContextStore("http://127.0.0.1:1", "g", Some("test-key"))
    val id = dead.store("local only")
    assert(dead.retrieve(id).isDefined)
    assert(dead.search("anything") == Nil)
    // wrong key: 401s on every path — same degradation
    GraphContextStore.resetEnsuredGraphs()
    val badKey = new GraphContextStore(base, "run-1", Some("wrong"))
    assert(badKey.store("rejected remotely") != null)
    assert(badKey.search("blue") == Nil)
  }
}
