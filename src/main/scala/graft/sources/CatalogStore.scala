package graft.sources

import java.io.File
import java.net.{URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets

/** Durable name→root registry for the serving catalogs — the
  * metastore role the reference delegates to Hive Metastore
  * (reference: `hive/Dockerfile:1-5`, `presto/config/
  * delta.properties.txt:2` — the thrift metastore is how its SQL
  * engines find the Delta tables). A serving layer that forgets its
  * tables on restart isn't a serving layer, so `graft.db.t` bindings
  * and `SHOW TABLES` rows live HERE, under the warehouse directory,
  * not in a JVM map.
  *
  * Layout: one [[PointerCas]] generation chain under `dir` whose
  * newest pointer holds the ENTIRE registry (sorted
  * `name\t<url-encoded root>` lines). The registry is names — small
  * by construction — so whole-content CAS buys atomic multi-entry
  * semantics for free: RENAME is one commit, racing CREATEs of the
  * same name serialize through the generation token (exactly one
  * wins), and readers always resolve a complete, never-torn snapshot.
  * On an object store the same chain rides the conditional-PUT
  * backends ([[HttpCas]]); here the [[LocalCas]] hard-link CAS.
  *
  * Mutations retry their read-modify-commit cycle on a lost race —
  * writers SERIALIZE; the bounded retry (64) only trips under
  * pathological churn and fails loudly. */
object CatalogStore {

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    URLDecoder.decode(s, StandardCharsets.UTF_8)

  private def render(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1).map { case (k, v) => s"$k\t${enc(v)}" }
      .mkString("\n")

  private def parse(s: String): Map[String, String] =
    s.linesIterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      l.substring(0, i) -> dec(l.substring(i + 1))
    }.toMap

  /** Registry generation — the cheap staleness probe callers cache
    * against (one directory listing; 0 = never written). */
  def gen(dir: File): Long = PointerCas.gen(dir)

  /** The full registry at its current generation. */
  def load(dir: File): (Long, Map[String, String]) = {
    val g = PointerCas.gen(dir)
    if (g == 0L) (0L, Map.empty)
    else (g, PointerCas.read(dir).map(parse).getOrElse(Map.empty))
  }

  private def mutate(dir: File)(
      f: Map[String, String] => Option[Map[String, String]]): Boolean = {
    dir.mkdirs()
    var attempt = 0
    while (attempt < 64) {
      val (g, m) = load(dir)
      f(m) match {
        case None => return false // refused against current state
        case Some(next) =>
          if (PointerCas.commitIfGen(dir, g, render(next))) return true
          attempt += 1 // lost the race: re-read the winner's registry
      }
    }
    sys.error(s"catalog registry at $dir: 64 straight lost CAS races")
  }

  /** Bind `name` → `root`, replacing any existing binding. */
  def upsert(dir: File, name: String, root: String): Unit = {
    mutate(dir)(m => Some(m + (name -> root)))
    ()
  }

  /** Bind `name` → `root` iff absent — false when the name is already
    * bound (possibly by a writer racing this call: the CAS serializes
    * them and exactly one CREATE wins). */
  def createExclusive(dir: File, name: String, root: String): Boolean =
    mutate(dir)(m => if (m.contains(name)) None else Some(m + (name -> root)))

  /** Unbind `name`; false when it wasn't bound. */
  def remove(dir: File, name: String): Boolean =
    mutate(dir)(m => if (m.contains(name)) Some(m - name) else None)

  /** Atomically rebind `from` → `to` (one CAS commit): throws when
    * `from` is unbound or `to` already taken — rename must never drop
    * a table or shadow another. */
  def rename(dir: File, from: String, to: String): Unit = {
    val ok = mutate(dir) { m =>
      require(m.contains(from), s"rename: '$from' is not bound")
      require(!m.contains(to), s"rename: '$to' is already bound")
      Some(m - from + (to -> m(from)))
    }
    require(ok, s"rename $from -> $to refused")
  }
}
