package graft

import graft.operators.KMeansFx

class KMeansFxSpec extends SparkSuite {
  import spark.implicits._

  private def vecs(rows: (Long, Array[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("two well-separated pairs converge to the natural 2-clustering") {
    // seeds are ids 1 and 2 (both in the left pair); after round 1 the
    // far pair drags centroid 1 right, after round 2 the split is the
    // natural one — the hand-traced Lloyd trajectory
    val v = vecs(
      1L -> Array(0.0, 0.0), 2L -> Array(0.1, 0.0),
      3L -> Array(10.0, 10.0), 4L -> Array(10.1, 10.0))
    val r = KMeansFx.assignments(v, k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("identical vectors: ties break to cluster 0, empty cluster keeps seed") {
    val v = vecs(1L -> Array(1.0, 2.0), 2L -> Array(1.0, 2.0),
      3L -> Array(1.0, 2.0))
    val r = KMeansFx.assignments(v, k = 2, iters = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("deterministic across partitionings (exact integer trajectory)") {
    val rows = (0L until 200L).map { i =>
      i -> Array(math.sin(i * 0.7), math.cos(i * 1.3), (i % 17) / 17.0)
    }
    val a = KMeansFx.assignments(rows.toDF("vec_id", "embedding")
        .repartition(11), k = 3, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = KMeansFx.assignments(rows.reverse.toDF("vec_id", "embedding")
        .repartition(3), k = 3, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("rejects bad knobs and too-few vectors") {
    val v = vecs(1L -> Array(0.0), 2L -> Array(1.0))
    intercept[IllegalArgumentException] {
      KMeansFx.assignments(v, k = 1, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeansFx.assignments(v, k = 3, iters = 1)
    }
    intercept[IllegalArgumentException] {
      KMeansFx.assignments(v, k = 2, iters = -1)
    }
  }
}
