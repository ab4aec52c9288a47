package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed row-status diff between two TABLES — the ops sibling of
  * [[graft.sources.VersionedTable.diffVersions]] (which diffs two
  * versions of ONE table as a multiset): given a key, classify every
  * row as added / removed / changed / unchanged between a before and
  * an after frame. The reconciliation primitive for migration
  * validation ("did the rewrite change anything it shouldn't have"),
  * replication checks, and CDC backfills.
  *
  * Both frames must share a schema and be UNIQUE per key (duplicate
  * keys would fan out through the full-outer join — enforce upstream;
  * the multiset form without a key is `diffVersions`' exceptAll).
  * Non-key columns are compared as one struct with NULL-SAFE equality
  * (a null field equals a null field).
  *
  * Scale shape: ONE full-outer hash equi-join on the key; the struct
  * compare is map-local. Output: (keys…, status). */
object TableDiff {

  def keyed(before: DataFrame, after: DataFrame,
            keys: Seq[String]): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs " +
        after.columns.mkString(","))
    val valCols = before.columns.filterNot(keys.contains).sorted
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+
        struct(valCols.map(col).toSeq: _*).as(as): _*)
    packed(before, "__bv")
      .join(packed(after, "__av"), keys, "full_outer")
      .withColumn("status",
        when(col("__av").isNull, "removed")
          .when(col("__bv").isNull, "added")
          .when(col("__bv") <=> col("__av"), "unchanged")
          .otherwise("changed"))
      .select(keys.map(col) :+ col("status"): _*)
  }
}
