package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ATOMIC MULTI-TABLE PUBLISH — a commit pointer spanning several
  * [[VersionedTable]]s (the generalized form of TextIndex's two-table
  * protocol, exposed as library surface): a pipeline that writes a
  * fact table AND its summary/index/dimension siblings needs readers
  * to see the tables move TOGETHER, or a dashboard joins today's facts
  * against yesterday's dimensions.
  *
  * Protocol: commit each table on its own (every commit is already
  * atomic and versioned), then [[publish]] the map {table root →
  * version} as ONE pointer commit through [[PointerCas]] — a
  * generation-numbered file whose exclusive creation is the
  * compare-and-swap. Readers resolve through [[readAt]]: they only
  * ever see version sets that were published together. A crash after
  * some table commits but before the publish leaves orphan versions
  * that no reader resolves — the next successful publish supersedes
  * them (vacuum reclaims their files after retention, the TextIndex
  * recovery stance).
  *
  * Multi-writer groups serialize through [[publishCas]]: the loser of
  * a race gets `false` back, re-reads the winner's snapshot, and
  * retries; readers still only ever see whole atomically-created
  * pointer files, so no torn version set is observable. [[publish]]
  * keeps the unconditional last-write-wins single-publisher contract
  * (now internally serialized, so it composes with CAS publishers). */
object SnapshotGroup {

  private def pointerBody(versions: Map[String, Long]): String =
    versions.toSeq.sortBy(_._1)
      .map { case (r, v) => s"$r\t$v" }.mkString("\n")

  /** The pointer generation a [[publishCas]] caller must echo back —
    * read it, build the version set (usually [[current]] plus the
    * caller's own tables), then CAS. */
  def currentGen(groupRoot: String): Long =
    PointerCas.gen(new File(groupRoot))

  /** CONDITIONAL publish — put-if-match on the pointer generation:
    * lands `versions` iff no other publisher won since the caller read
    * `expectedGen` ([[currentGen]]). False = lost the race; re-read
    * [[current]]/[[currentGen]] (the winner's snapshot) and retry with
    * a version set rebuilt on top of it. Two racing publishers thus
    * SERIALIZE: one wins, one retries — neither publish is silently
    * overwritten. */
  def publishCas(groupRoot: String, versions: Map[String, Long],
                 expectedGen: Long): Boolean = {
    require(versions.nonEmpty, "empty publish")
    new File(groupRoot).mkdirs()
    PointerCas.commitIfGen(new File(groupRoot), expectedGen,
      pointerBody(versions))
  }

  /** Atomically publish a consistent set of (table root → version). */
  def publish(groupRoot: String, versions: Map[String, Long]): Unit = {
    require(versions.nonEmpty, "empty publish")
    new File(groupRoot).mkdirs()
    // unconditional, but serialized through the same generation chain
    // so interleaved CAS publishers still detect it as a conflict
    while (!publishCas(groupRoot, versions, currentGen(groupRoot))) ()
  }

  /** The currently published version set, if any publish ever landed.
    * Falls back to the pre-upgrade fixed-name `_published` pointer so
    * existing groups stay readable; the first post-upgrade publish
    * moves them onto the generation chain. */
  def current(groupRoot: String): Option[Map[String, Long]] =
    PointerCas.readOrLegacy(new File(groupRoot), "_published").map {
      _.split('\n').filter(_.nonEmpty).map { line =>
        val Array(r, v) = line.split('\t')
        r -> v.toLong
      }.toMap
    }

  /** Read `tableRoot` AT its published version — never the latest
    * (unpublished commits are invisible by construction). */
  def readAt(spark: SparkSession, groupRoot: String,
             tableRoot: String): DataFrame = {
    val vs = current(groupRoot)
      .getOrElse(sys.error(s"nothing published at $groupRoot"))
    val v = vs.getOrElse(tableRoot,
      sys.error(s"$tableRoot not part of the published group"))
    VersionedTable.readVersion(spark, tableRoot, v)
  }
}
