package graft.operators

import graft.SparkSuite

/** Both key generators must produce exactly {offset+1 … offset+n},
  * each id once (SURVEY.md §7.4 "Surrogate-key protocol"). */
class KeyGenSpec extends SparkSuite {

  private def input = {
    import spark.implicits._
    (1 to 1000).map(i => (s"row$i", i % 7)).toDF("name", "grp").repartition(8)
  }

  for ((gen, label) <- Seq(
      (GlobalRowNumberKeyGen, "GlobalRowNumberKeyGen"),
      (PartitionOffsetKeyGen, "PartitionOffsetKeyGen"))) {
    test(s"$label assigns dense unique keys continuing from offset") {
      val out = gen.assign(input, "k", offset = 500)
      val keys = out.select("k").collect().map(_.getInt(0)).sorted
      assert(keys.toSeq == (501 to 1500))
      assert(out.columns.toSeq == Seq("name", "grp", "k"))
    }
  }

  test("PartitionOffsetKeyGen avoids a global single-partition sort") {
    val plan = PartitionOffsetKeyGen.assign(input, "k", 0)
      .queryExecution.executedPlan.toString
    // the window must be partitioned (by __pid), not global
    assert(plan.contains("windowspecdefinition(__pid"))
  }
}
