package org.apache.spark.sql.graft

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, TableInfo}
import org.apache.spark.sql.connector.write.LogicalWriteInfoImpl
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSuite
import graft.sources.VersionedTable

/** RTAS abort precision: aborting a staged REPLACE must restore ONLY
  * the exact version the replace's own write committed. A concurrent
  * writer's commit that lands between the RTAS overwrite and the abort
  * must never be silently reverted along with it (fail loudly, leave
  * state for the operator); an RTAS whose write never landed has
  * nothing to undo regardless of what else committed meanwhile. */
class StagedReplaceAbortSpec extends SparkSuite {

  private def freshRegistered(name: String): (GraftCatalog, Identifier, String) = {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_rtas").resolve("t").toString
    VersionedTable.overwrite(
      (1L to 10L).map(i => (i, s"old$i")).toDF("k", "s"), root)
    GraftCatalog.install(spark)
    GraftCatalog.register(spark, "db", name, root)
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    (cat, Identifier.of(Array("db"), name), root)
  }

  private def tblInfo(): TableInfo = new TableInfo.Builder()
    .withColumns(org.apache.spark.sql.connector.catalog.CatalogV2Util
      .structTypeToV2Columns(org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, n INT")))
    .withProperties(java.util.Collections.emptyMap[String, String]())
    .withPartitions(Array.empty)
    .build()

  private def writeThrough(staged: GraftStagedTable): Unit = {
    import spark.implicits._
    val df = (1L to 3L).map(i => (i * 10, i.toInt)).toDF("id", "n")
    val w = staged.newWriteBuilder(LogicalWriteInfoImpl(
      "q1", df.schema, CaseInsensitiveStringMap.empty())).build()
    w.asInstanceOf[org.apache.spark.sql.connector.write.V1Write]
      .toInsertableRelation.insert(df, overwrite = false)
  }

  test("abort after a committed replace write restores the pre-replace " +
    "version") {
    val (cat, ident, root) = freshRegistered("ab1")
    val staged = cat.stageReplace(ident, tblInfo())
      .asInstanceOf[GraftStagedTable]
    writeThrough(staged)
    assert(staged.writeCommittedV.get() == 1L)
    staged.abortStagedChanges()
    val df = VersionedTable.read(spark, root)
    assert(df.columns.toSeq == Seq("k", "s") && df.count() == 10L,
      "abort must restore the pre-replace table")
  }

  test("abort REFUSES to restore over a concurrent commit that landed " +
    "after the replace write — and leaves it intact") {
    import spark.implicits._
    val (cat, ident, root) = freshRegistered("ab2")
    val staged = cat.stageReplace(ident, tblInfo())
      .asInstanceOf[GraftStagedTable]
    writeThrough(staged) // v1 = the replace overwrite
    // an unrelated writer lands v2 before the abort fires
    VersionedTable.append(Seq((99L, 9)).toDF("id", "n"), root)
    val e = intercept[RuntimeException] { staged.abortStagedChanges() }
    assert(e.getMessage.contains("not auto-restoring"), e.getMessage)
    assert(VersionedTable.read(spark, root).count() == 4L,
      "the concurrent commit must survive the refused abort")
  }

  test("abort with NO committed write is a no-op even when concurrent " +
    "commits landed meanwhile") {
    import spark.implicits._
    val (cat, ident, root) = freshRegistered("ab3")
    val staged = cat.stageReplace(ident, tblInfo())
      .asInstanceOf[GraftStagedTable]
    assert(staged.writeCommittedV.get() == -1L)
    VersionedTable.append(Seq((11L, "new")).toDF("k", "s"), root)
    staged.abortStagedChanges() // must not throw, must not restore
    assert(VersionedTable.read(spark, root).count() == 11L,
      "an abort with nothing to undo must leave the concurrent append")
  }
}
