package graft.avro

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.avro.Schema

/** [[SchemaRegistry]] over the Confluent Schema Registry REST protocol —
  * the transport the reference's registries actually speak
  * (`application-local.yml:7,13` points at `http://localhost:8081/8082`).
  * Protocol subset (the endpoints the replication pipeline needs):
  *
  *  - `POST /subjects/{subject}/versions` body `{"schema": "<avsc>"}` → `{"id": N}`
  *  - `GET /schemas/ids/{id}` → `{"schema": "<avsc>"}`
  *  - `GET /subjects` → `["a-value", ...]`
  *  - `GET /subjects/{subject}/versions/latest` → `{"id": N, "version": V, "schema": "..."}`
  *
  * The client is a thin JDK `HttpClient` binding; all registry semantics
  * (monotonic ids, versions, BACKWARD compatibility) live server-side, so
  * this class against a real Confluent deployment behaves identically to
  * [[ConfluentFileRegistry]] locally — the trait, not the transport, is the
  * engine's contract.
  */
final class ConfluentHttpRegistry(baseUrl: String) extends SchemaRegistry {

  @transient private lazy val client = HttpClient.newHttpClient()
  @transient private lazy val mapper = new ObjectMapper()

  private def enc(subject: String): String =
    java.net.URLEncoder.encode(subject, StandardCharsets.UTF_8)

  private def get(path: String): Option[String] = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None // not-found is an answer...
      case code => throw new IllegalStateException( // ...a 5xx/503 is not:
        s"registry GET $path failed ($code): ${resp.body()}") // retryable, don't mask as absent
    }
  }

  def register(subject: String, schema: Schema): Long = {
    val body = mapper.createObjectNode()
    body.put("schema", schema.toString)
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"$baseUrl/subjects/${enc(subject)}/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
        .build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new IllegalStateException(
        s"registry rejected $subject registration (${resp.statusCode()}): ${resp.body()}")
    mapper.readTree(resp.body()).get("id").asLong()
  }

  def byId(id: Long): Option[Schema] =
    get(s"/schemas/ids/$id").map(b =>
      new Schema.Parser().parse(mapper.readTree(b).get("schema").asText()))

  def latest(subject: String): Option[(Long, Schema)] =
    get(s"/subjects/${enc(subject)}/versions/latest").map { b =>
      val node = mapper.readTree(b)
      node.get("id").asLong() ->
        new Schema.Parser().parse(node.get("schema").asText())
    }

  override def latestVersion(subject: String): Option[Int] =
    get(s"/subjects/${enc(subject)}/versions/latest")
      .map(b => mapper.readTree(b).get("version").asInt())

  // one request, one consistent snapshot — two separate GETs could pair a
  // new version number with the previous id/schema under concurrent writes
  override def latestEntry(subject: String): Option[(Int, Long, Schema)] =
    get(s"/subjects/${enc(subject)}/versions/latest").map { b =>
      val node = mapper.readTree(b)
      (node.get("version").asInt(), node.get("id").asLong(),
        new Schema.Parser().parse(node.get("schema").asText()))
    }

  def subjects: Seq[String] =
    get("/subjects").toSeq.flatMap { b =>
      val arr = mapper.readTree(b)
      (0 until arr.size()).map(arr.get(_).asText())
    }.sorted
}

/** Serializable ref for the HTTP registry (Confluent framing). */
final case class ConfluentHttpRegistryRef(baseUrl: String) extends RegistryRef {
  def open(): SchemaRegistry = new ConfluentHttpRegistry(baseUrl)
  def magic: Byte = WireFormat.ConfluentMagic
}

/** Serve any [[SchemaRegistry]] over the Confluent REST protocol (JDK
  * `com.sun.net.httpserver`, no external deps) — the counterpart that lets
  * two graft pipelines, or graft and a Confluent-tooling consumer, share a
  * registry over the wire. */
object ConfluentHttpServer {

  /** Start serving `reg` on an ephemeral port; returns (server, baseUrl).
    * Stop with `server.stop(0)`. */
  def serve(reg: SchemaRegistry): (HttpServer, String) = {
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)

    def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/vnd.schemaregistry.v1+json")
      ex.sendResponseHeaders(code, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    }
    def notFound(ex: HttpExchange, code: Int, msg: String): Unit =
      respond(ex, 404, s"""{"error_code": $code, "message": "$msg"}""")

    server.createContext("/", (ex: HttpExchange) => {
      try {
        val path = ex.getRequestURI.getPath.stripSuffix("/")
        val parts = path.split("/").filter(_.nonEmpty)
          .map(java.net.URLDecoder.decode(_, StandardCharsets.UTF_8))
        (ex.getRequestMethod, parts.toSeq) match {
          case ("POST", Seq("subjects", subject, "versions")) =>
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            val schema = new Schema.Parser().parse(mapper.readTree(body).get("schema").asText())
            try {
              val id = reg.register(subject, schema)
              respond(ex, 200, s"""{"id": $id}""")
            } catch { case e: IllegalStateException =>
              // Confluent's incompatible-schema error shape
              respond(ex, 409, s"""{"error_code": 409, "message": ${mapper.writeValueAsString(e.getMessage)}}""")
            }
          case ("GET", Seq("schemas", "ids", id)) =>
            reg.byId(id.toLong) match {
              case Some(s) => respond(ex, 200,
                s"""{"schema": ${mapper.writeValueAsString(s.toString)}}""")
              case None => notFound(ex, 40403, "Schema not found")
            }
          case ("GET", Seq("subjects")) =>
            respond(ex, 200, reg.subjects.map(s =>
              mapper.writeValueAsString(s)).mkString("[", ",", "]"))
          case ("GET", Seq("subjects", subject, "versions", "latest")) =>
            reg.latestEntry(subject) match {
              case Some((version, id, s)) =>
                respond(ex, 200,
                  s"""{"subject": ${mapper.writeValueAsString(subject)}, "id": $id, """ +
                    s""""version": $version, "schema": ${mapper.writeValueAsString(s.toString)}}""")
              case None => notFound(ex, 40401, "Subject not found")
            }
          case _ => notFound(ex, 40401, "Unknown endpoint")
        }
      } catch {
        case e: Exception => respond(ex, 500,
          s"""{"error_code": 500, "message": ${new ObjectMapper().writeValueAsString(e.getMessage)}}""")
      }
    })
    server.start()
    (server, s"http://127.0.0.1:${server.getAddress.getPort}")
  }
}
