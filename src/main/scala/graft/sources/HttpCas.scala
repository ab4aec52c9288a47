package graft.sources

import java.io.File
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** [[CasBackend]] over a GENERIC HTTP object store speaking the
  * conditional-PUT dialect every major store exposes — the wire form
  * of the S3/GCS/ABFS put-if-absent this seam was designed around:
  *
  *  - `PUT <key>` with `If-None-Match: *` — create iff the key does
  *    not exist; `412 Precondition Failed` is the LOST CAS (S3 and
  *    GCS return exactly this; ABFS returns `409 Conflict` — both
  *    map to false);
  *  - `GET <key>` — full content or `404`;
  *  - `DELETE <key>` — idempotent;
  *  - `GET <prefix>/?list` — newline-separated IMMEDIATE child names
  *    (the ListObjectsV2-with-delimiter role, reduced to what the
  *    pointer protocol needs).
  *
  * The put is atomic ON THE STORE (the precondition is evaluated
  * server-side against the then-current state), so the whole
  * [[PointerCas]] generation protocol — and everything fenced by it:
  * TextIndex commits, SnapshotGroup publishes — runs byte-identical
  * over the wire: CasBackendSpec's race matrix (racing increments,
  * exclusive wins, the phantom-slot withdrawal) is executed against
  * this backend through an in-process stub store.
  *
  * Keys mirror the local layout: each path segment of the `File` is
  * URL-encoded under `endpoint`, so one table root maps to one key
  * prefix. Non-2xx/404/412 responses raise `IOException` — a throttled
  * or failing store must surface, never read as a lost race (a false
  * from a 500 would make the caller retry a commit the store may have
  * APPLIED). */
final class HttpCas(endpoint: String,
                    client: HttpClient = HttpClient.newBuilder()
                      .version(HttpClient.Version.HTTP_1_1)
                      .connectTimeout(java.time.Duration.ofSeconds(10))
                      .build(),
                    requestTimeout: java.time.Duration =
                      java.time.Duration.ofSeconds(30))
    extends CasBackend {

  // every call carries connect + request timeouts: the put fences
  // commit protocols, and a black-holed store must surface as an
  // IOException (HttpTimeoutException is one), never wedge the writer

  private val base = endpoint.stripSuffix("/")

  private def keyOf(f: File): String =
    f.getAbsolutePath.split('/').filter(_.nonEmpty)
      .map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("/")

  private def uriFor(f: File): URI = URI.create(s"$base/${keyOf(f)}")

  override def list(dir: File): Seq[String] = {
    val rsp = client.send(
      HttpRequest.newBuilder(URI.create(s"$base/${keyOf(dir)}/?list"))
        .timeout(requestTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))
    rsp.statusCode() match {
      case 200 => rsp.body().split('\n').filter(_.nonEmpty).toSeq
        .map(java.net.URLDecoder.decode(_, "UTF-8"))
      case 404 => Seq.empty
      case c => throw new java.io.IOException(s"LIST ${keyOf(dir)}: HTTP $c")
    }
  }

  override def read(f: File): Array[Byte] = {
    val rsp = client.send(
      HttpRequest.newBuilder(uriFor(f)).timeout(requestTimeout).GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    rsp.statusCode() match {
      case 200 => rsp.body()
      case 404 => throw new java.nio.file.NoSuchFileException(f.getPath)
      case c => throw new java.io.IOException(s"GET ${keyOf(f)}: HTTP $c")
    }
  }

  override def putIfAbsent(f: File, content: Array[Byte]): Boolean = {
    val rsp = client.send(
      HttpRequest.newBuilder(uriFor(f)).timeout(requestTimeout)
        .header("If-None-Match", "*")
        .PUT(HttpRequest.BodyPublishers.ofByteArray(content)).build(),
      HttpResponse.BodyHandlers.discarding())
    rsp.statusCode() match {
      case c if c >= 200 && c < 300 => true
      case 412 | 409 => false // lost the CAS (S3/GCS: 412; ABFS: 409)
      case c => throw new java.io.IOException(s"PUT ${keyOf(f)}: HTTP $c")
    }
  }

  override def delete(f: File): Unit = {
    val rsp = client.send(
      HttpRequest.newBuilder(uriFor(f)).timeout(requestTimeout).DELETE().build(),
      HttpResponse.BodyHandlers.discarding())
    rsp.statusCode() match {
      case c if (c >= 200 && c < 300) || c == 404 => ()
      case c => throw new java.io.IOException(s"DELETE ${keyOf(f)}: HTTP $c")
    }
  }
}
