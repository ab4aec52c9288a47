package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership prefilters — the explicit form of Spark's
  * runtime bloom filter: build a compact sketch from the SMALL side,
  * ship it as a literal, and drop non-matching rows of the BIG side
  * map-locally BEFORE any join/shuffle. False positives only cost work
  * (they proceed to the exact check); false negatives are impossible,
  * so an exact verification step downstream keeps results exact.
  *
  * At 100 TB this is the decontamination/semi-join shape when even the
  * exploded broadcast table is bigger than you'd like on every
  * executor: the bloom bits are ~10 bits/item at 1% fpp regardless of
  * item width. */
object BloomFilterOps {

  /** A boolean Column: might `testCol`'s value be among `buildCol`'s
    * values in `build`? Hash-domain: xxhash64 on both sides (the bloom
    * stores longs). Triggers one aggregation job over `build` (the
    * small side) at call time; the resulting sketch rides the plan as
    * a literal — codegen'd, no UDF, no broadcast-join machinery. */
  def mightContain(build: DataFrame, buildCol: Column, testCol: Column,
                   expectedItems: Long, fpp: Double = 0.03): Column = {
    val bf = build.stat.bloomFilter(xxhash64(buildCol), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expression(xxhash64(testCol))))
  }
}
