package graft.verify

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.ConcurrentHashMap

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** One retrieved evidence hit from the graph backend
  * (reference: ondine/context/protocol.py RetrievalResult). */
final case class GraphHit(text: String, score: Double, sourceRef: String)

/** Cloud knowledge-graph context backend — the reference's Zep store
  * semantics (ondine/context/zep_store.py:28-156) over a plain
  * chat-free REST dialect:
  *
  *  - `ensureGraph`: `POST {base}/graph {"graph_id":…}` — idempotent per
  *    JVM; a 409 / "already exists" reply is success (zep_store.py:54-66).
  *  - `store`: claims POST as `{"type":"text","data":"[TYPE] text"}` to
  *    `{base}/graph/{id}/add`; the service extracts entities/relations
  *    server-side. Every record is ALSO cached locally so `retrieve`
  *    answers without a network hop (zep_store.py:93-113).
  *  - `search`: `POST {base}/graph/{id}/search` with query (truncated to
  *    400 chars), `scope:"edges"`, limit, `reranker:"cross_encoder"`;
  *    edges contribute (fact, score, name), nodes (summary|name, score,
  *    name), truncated to limit (zep_store.py:115-151).
  *
  * Degradation contract, identical to the reference: no API key →
  * `available=false`, `store` still returns ids and caches locally,
  * `search` returns Nil; a failing remote NEVER fails the pipeline —
  * store/search errors are logged and swallowed. The SaaS itself is not
  * reachable from this environment, so the spec drives the store against
  * an in-process loopback graph service (the same discipline as
  * HttpLlmClientSpec / MiniRedis); pointing it at a real provider is a
  * base-URL + auth-header concern, not a semantics change.
  */
final class GraphContextStore(
    baseUrl: String,
    graphId: String,
    apiKey: Option[String] = None,
    timeoutMs: Long = 10000L) {

  import GraphContextStore._

  /** Effective credential, with the reference's resolution rule
    * (zep_store.py:30-32): explicit key, else the environment, and a
    * BLANK key counts as absent — a set-but-empty env var must not
    * produce an "active" backend that 401s every call. */
  private val key: Option[String] =
    apiKey.filter(_.nonEmpty)
      .orElse(sys.env.get("GRAPH_STORE_API_KEY").filter(_.nonEmpty))

  // driver-side store, deliberately NOT Serializable: evidence flows into
  // Spark via ContextStore's DataFrame tables, this client manages the
  // remote graph from the driver (like the reference's store object)
  private lazy val http: HttpClient =
    HttpClient.newBuilder()
      .connectTimeout(Duration.ofMillis(math.min(timeoutMs, 10000L)))
      .build()

  private val local = new ConcurrentHashMap[String, (String, String)]()

  @volatile private var closed = false

  /** The reference's availability rule: a backend without credentials —
    * or after close() — is present-but-inactive (zep_store.py:90-91,
    * :154-156). */
  def available: Boolean = key.isDefined && !closed

  if (available) ensureGraph()

  private def post(path: String, body: String): Option[HttpResponse[String]] =
    try {
      val b = HttpRequest.newBuilder(URI.create(s"$baseUrl$path"))
        .timeout(Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
      key.foreach(k => b.header("Authorization", s"Api-Key $k"))
      Some(http.send(b.build(), HttpResponse.BodyHandlers.ofString()))
    } catch {
      case _: InterruptedException =>
        // degradation must not eat a task kill: restore the flag so the
        // caller's next interruption point still fires
        Thread.currentThread().interrupt()
        None
      case _: Exception => None // network failure = degradation
    }

  /** Create the graph; idempotent per (endpoint, graph) per JVM.
    * 2xx and 409/"already exists" cache as done; an UNREACHABLE or
    * failed create is deliberately NOT cached (deviation from the
    * reference's unconditional `_created_graphs.add`, zep_store.py:66:
    * a transient outage at first construction must not condemn every
    * later add in this JVM to 404 forever — the next instance retries). */
  private def ensureGraph(): Unit = {
    val cacheKey = s"$baseUrl|$graphId"
    if (createdGraphs.containsKey(cacheKey)) return
    post("/graph", mapper.writeValueAsString(
      mapper.createObjectNode().put("graph_id", graphId))) match {
      case Some(r) if r.statusCode() / 100 == 2 =>
        log.info("graph store: created graph {}", graphId)
        createdGraphs.put(cacheKey, java.lang.Boolean.TRUE)
      case Some(r) if r.statusCode() == 409 ||
        Option(r.body()).exists(_.toLowerCase.contains("already exists")) =>
        // someone else created it — exactly what idempotent means
        createdGraphs.put(cacheKey, java.lang.Boolean.TRUE)
      case other =>
        log.warn("graph store: create {} -> {} (will retry on next instance)",
          graphId, other.map(_.statusCode().toString).getOrElse("unreachable"): Any)
    }
  }

  /** Store one claim; returns its id (caller-supplied or minted). The
    * remote add is best-effort; the local cache always succeeds. */
  def store(text: String, claimType: String = "Factual",
            claimId: Option[String] = None): String = {
    val id = claimId.getOrElse(java.util.UUID.randomUUID().toString)
    local.put(id, (text, claimType))
    if (available) {
      val formatted = s"[${claimType.toUpperCase}] $text"
      val body = mapper.createObjectNode()
      body.put("type", "text")
      body.put("data", formatted)
      post(s"/graph/$graphId/add", mapper.writeValueAsString(body)) match {
        case Some(r) if r.statusCode() / 100 == 2 => ()
        case other => log.warn("graph store: add for {} -> {}", id,
          other.map(_.statusCode().toString).getOrElse("unreachable"): Any)
      }
    }
    id
  }

  /** Local-cache lookup — the reference never round-trips retrieval by id
    * (zep_store.py:112-113). */
  def retrieve(claimId: String): Option[(String, String)] =
    Option(local.get(claimId))

  /** Graph search: edges first (facts), then nodes (summaries), capped at
    * `limit`. Unavailable/failing backends return Nil, never throw. */
  def search(query: String, limit: Int = 5): Seq[GraphHit] = {
    if (!available) return Nil
    val body = mapper.createObjectNode()
    body.put("query", query.take(400))
    body.put("scope", "edges")
    body.put("limit", limit)
    body.put("reranker", "cross_encoder")
    post(s"/graph/$graphId/search", mapper.writeValueAsString(body)) match {
      case Some(r) if r.statusCode() / 100 == 2 =>
        try {
          val root = mapper.readTree(r.body())
          val edges = arr(root, "edges").map { e =>
            GraphHit(str(e, "fact"), num(e, "score"), str(e, "name"))
          }
          val nodes = arr(root, "nodes").map { n =>
            val t = Some(str(n, "summary")).filter(_.nonEmpty)
              .getOrElse(str(n, "name"))
            GraphHit(t, num(n, "score"), str(n, "name"))
          }
          (edges ++ nodes).take(limit)
        } catch { case _: Exception => Nil } // malformed reply = no hits
      case _ => Nil
    }
  }

  /** Deactivate and drop the cache: post-close, store() is cache-only…
    * except the cache is cleared too, matching the reference exactly
    * (zep_store.py:154-156 clears records AND nulls the client). */
  def close(): Unit = { closed = true; local.clear() }
}

object GraphContextStore {
  private val log = org.slf4j.LoggerFactory.getLogger(classOf[GraphContextStore])
  private val mapper = new ObjectMapper()
  /** (endpoint, graph) pairs already ensured this JVM (zep_store.py:20,
    * 54-66 `_created_graphs`). */
  private val createdGraphs = new ConcurrentHashMap[String, java.lang.Boolean]()
  /** Test seam: forget ensured graphs (a fresh JVM in miniature). */
  private[graft] def resetEnsuredGraphs(): Unit = createdGraphs.clear()

  private def arr(n: JsonNode, field: String): Seq[JsonNode] = {
    val a = n.path(field)
    if (!a.isArray) Nil else (0 until a.size).map(a.get)
  }
  private def str(n: JsonNode, field: String): String =
    Option(n.path(field).textValue()).getOrElse("")
  private def num(n: JsonNode, field: String): Double =
    if (n.path(field).isNumber) n.path(field).asDouble() else 0.0
}
