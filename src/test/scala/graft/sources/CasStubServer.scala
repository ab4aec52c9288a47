package graft.sources

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-process HTTP object-store STUB with store-side conditional-PUT
  * semantics — the wire twin of [[InMemoryCas]]: the `If-None-Match`
  * precondition is evaluated atomically against the current key map
  * (exactly one concurrent creator of a key receives 2xx; the rest
  * get 412), so [[HttpCas]]'s race matrix runs against real HTTP
  * round-trips with real server-side atomicity.
  *
  * `requireSigV4 = Some(accessKey -> secretKey)` turns it into a
  * signature-ENFORCING store: every request's Authorization header is
  * re-derived server-side ([[SigV4.verify]] — same math a real
  * S3/MinIO endpoint runs) and a missing or mismatched signature gets
  * 403 before any store state is touched. */
final class CasStubServer(requireSigV4: Option[(String, String)] = None) {

  private val store =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.createContext("/", (x: HttpExchange) => handle(x))
  server.start()

  def endpoint: String =
    s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  /** Keys currently stored (decoded) — for spec assertions. */
  def keys: Set[String] = {
    import scala.jdk.CollectionConverters._
    store.keySet.asScala.toSet
  }

  private def handle(x: HttpExchange): Unit = {
    try {
      val raw = x.getRequestURI.getRawPath.stripPrefix("/")
      val isList = Option(x.getRequestURI.getRawQuery).contains("list")
      // auth gate first — a real store rejects before touching state.
      // The payload must be read up front (it is part of the signed
      // content); the PUT branch below reuses it.
      val body = x.getRequestBody.readAllBytes()
      requireSigV4.foreach { case (_, secret) =>
        val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
        val bad = auth match {
          case None => Some("no Authorization header")
          case Some(a) =>
            // reconstruct the absolute URI the client signed: the
            // exchange's URI is origin-form; host comes from the header
            val uri = java.net.URI.create(
              s"http://${x.getRequestHeaders.getFirst("Host")}" +
                x.getRequestURI.toString)
            SigV4.verify(a, x.getRequestMethod, uri,
              n => Option(x.getRequestHeaders.getFirst(n)), body, secret)
        }
        if (bad.isDefined) {
          x.sendResponseHeaders(403, -1)
          x.close()
          return
        }
      }
      x.getRequestMethod match {
        case "GET" if isList =>
          val prefix = raw.stripSuffix("/") + "/"
          import scala.jdk.CollectionConverters._
          val names = store.keySet.asScala.toSeq.collect {
            case k if k.startsWith(prefix) &&
              !k.stripPrefix(prefix).contains('/') => k.stripPrefix(prefix)
          }
          val body = names.mkString("\n").getBytes("UTF-8")
          x.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) x.getResponseBody.write(body)
        case "GET" =>
          val b = store.get(raw)
          if (b == null) x.sendResponseHeaders(404, -1)
          else {
            x.sendResponseHeaders(200, if (b.isEmpty) -1 else b.length)
            if (b.nonEmpty) x.getResponseBody.write(b)
          }
        case "PUT" =>
          val conditional =
            Option(x.getRequestHeaders.getFirst("If-None-Match"))
              .contains("*")
          if (!conditional) {
            // this stub models only the CAS dialect; an unconditional
            // PUT would silently void exactly-one-winner
            x.sendResponseHeaders(400, -1)
          } else if (store.putIfAbsent(raw, body) == null)
            x.sendResponseHeaders(201, -1)
          else x.sendResponseHeaders(412, -1)
        case "DELETE" =>
          store.remove(raw)
          x.sendResponseHeaders(204, -1)
        case _ => x.sendResponseHeaders(405, -1)
      }
    } finally x.close()
  }
}
