package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class GridJoinSpec extends SparkSuite {

  import spark.implicits._

  /** Adversarial fixture: points ON cell corners/edges (multiples of
    * the radius), just inside/outside the radius along axes and
    * diagonals, negative coordinates straddling the origin, and a
    * pseudo-random cloud. */
  private def fixture = {
    val boundary = Seq(
      (0L, 0L, 0L), (1L, 100L, 0L), (2L, 0L, 100L), (3L, 100L, 100L),
      (4L, 101L, 0L), (5L, 0L, 101L), (6L, 71L, 71L), (7L, 71L, 72L),
      (8L, -1L, -1L), (9L, -100L, 0L), (10L, -100L, -100L),
      (11L, -101L, 0L), (12L, 200L, 200L), (13L, 199L, 200L))
    val cloud = (100L until 400L).map { i =>
      (i, i * 2654435761L % 997L - 300L, i * 40503L % 991L - 300L)
    }
    (boundary ++ cloud).toDF("id", "x", "y")
  }

  test("selfRadiusPairs equals brute force on boundary + cloud; each pair once") {
    val pts = fixture
    val got = GridJoin.selfRadiusPairs(pts, "id", "x", "y", radius = 100L)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toList
    val a = pts.select(col("id").as("id_a"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("id").as("id_b"), col("x").as("bx"), col("y").as("by"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= 100L * 100L)
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toList
    assert(got.size == got.toSet.size, "duplicate pair emitted")
    assert(got.toSet == brute.toSet)
    assert(brute.nonEmpty)
    // boundary semantics: dist == radius is IN (0,0)-(100,0);
    // (0,0)-(101,0) is OUT; diagonal (0,0)-(71,71) in (71²·2 = 10082 > 10000? no —
    // 10082 > 10000 so OUT) and (0,0)-(71,72)… asserted via brute equality above;
    // pin the exact-radius edge explicitly:
    assert(got.toSet.contains((0L, 1L, 10000L)))
    assert(!got.exists(p => p._1 == 0L && p._2 == 4L))
  }

  /** Urban-density fixture: 20% of points collapse into ONE cell
    * (coordinates folded into [0, r)), the rest spread widely. */
  private def hotFixture = {
    val r = 100L
    (0L until 500L).map { i =>
      val (x, y) = (i * 2654435761L % 99991L, i * 40503L % 99989L)
      if (i % 5 == 0) (i, x % r, y % r) else (i, x, y)
    }.toDF("id", "x", "y")
  }

  test("salted radius join: EXACT on the hot fixture (equals the " +
    "unsalted path pair-for-pair); salting touches only distribution") {
    val pts = hotFixture
    val exact = GridJoin.selfRadiusPairs(pts, "id", "x", "y", 100L)
      .as[(Long, Long, Long)].collect().toSet
    val salted = GridJoin.selfRadiusPairsSalted(pts, "id", "x", "y", 100L,
      salts = 4, hotThreshold = 50L)
      .as[(Long, Long, Long)].collect().toList
    assert(salted.size == salted.toSet.size, "duplicate pair emitted")
    assert(salted.toSet == exact)
    assert(exact.size > 4000, "hot cell must dominate the pair set")
    // threshold above every cell's occupancy → degenerates to the
    // plain path (nothing hot, salt column constant)
    val unhot = GridJoin.selfRadiusPairsSalted(pts, "id", "x", "y", 100L,
      salts = 4, hotThreshold = 100000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(unhot == exact)
  }

  test("cellCap: deterministic sampling semantics — output equals the " +
    "spec's replay of the thinning rule; candidates bounded by 9·cap") {
    val pts = hotFixture
    val r = 100L
    val cap = 20L
    val got = GridJoin.selfRadiusPairsSalted(pts, "id", "x", "y", r,
      salts = 4, hotThreshold = 50L, cellCap = cap)
      .as[(Long, Long, Long)].collect().toSet
    // replay the documented rule: per build cell keep the cap-many
    // rows ranked by xxhash64 over the full build row, then brute-join
    val b = pts.select(col("id").as("id_b"), col("x").as("bx"),
      col("y").as("by"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(((col("bx") - pmod(col("bx"), lit(r))) / r).cast("long"),
        ((col("by") - pmod(col("by"), lit(r))) / r).cast("long"))
      .orderBy(xxhash64(col("id_b"), col("bx"), col("by")),
        col("bx"), col("by"))
    val keptBuild = b.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
    val a = pts.select(col("id").as("id_a"), col("x").as("ax"),
      col("y").as("ay"))
    val want = a.crossJoin(keptBuild)
      .withColumn("dist2",
        (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
      .filter(col("dist2") <= r * r && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "dist2")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "capped output must equal the deterministic rule")
    // stable across a different partitioning (content-hash rank, not
    // physical order)
    val got2 = GridJoin.selfRadiusPairsSalted(pts.repartition(7),
      "id", "x", "y", r, salts = 4, hotThreshold = 50L, cellCap = cap)
      .as[(Long, Long, Long)].collect().toSet
    assert(got2 == got)
    // the cap bites AND bounds: a strict subset of exact, with every
    // probe point's candidate volume ≤ 9·cap (arithmetic on kept build)
    val exact = GridJoin.selfRadiusPairs(pts, "id", "x", "y", r)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.subsetOf(exact) && got.size < exact.size)
    val maxPerCell = keptBuild
      .groupBy(((col("bx") - pmod(col("bx"), lit(r))) / r).cast("long"),
        ((col("by") - pmod(col("by"), lit(r))) / r).cast("long"))
      .count().agg(max(col("count"))).first().getLong(0)
    assert(maxPerCell <= cap)
  }

  test("two-table radiusJoin equals cross-join residual; plan is a hash equi-join") {
    val l = fixture.select(col("id").as("lid"), col("x").as("lx"), col("y").as("ly"))
    val r = fixture.select(col("id").as("rid"), col("x").as("rx"), col("y").as("ry"))
    val join = GridJoin.radiusJoin(l, "lx", "ly", r, "rx", "ry", radius = 73L)
    val got = join.select("lid", "rid").as[(Long, Long)].collect().toSet
    val brute = l.crossJoin(r)
      .filter((col("lx") - col("rx")) * (col("lx") - col("rx")) +
        (col("ly") - col("ry")) * (col("ly") - col("ry")) <= 73L * 73L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got == brute && got.nonEmpty)
    val plan = join.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("nearestNeighbor: equals brute-force NN; multi-round escalation; out-of-ring absent") {
    // a far-away outlier whose NN sits beyond the final ring must be
    // ABSENT, not wrong
    val pts = fixture.unionByName(Seq((9999L, 100000L, 100000L)).toDF("id", "x", "y"))
    // radius 16 with 4 rounds → final ring 128; cloud spans ~600, so
    // several points need escalation and the outlier never matches
    val got = GridJoin.nearestNeighbor(pts, "id", "x", "y",
      radius = 16L, maxRounds = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val all = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = all.map { case (i, x, y) =>
      val cands = all.filter(_._1 != i)
        .map { case (j, bx, by) =>
          (j, (x - bx) * (x - bx) + (y - by) * (y - by)) }
        .sortBy { case (j, d2) => (d2, j) }
      i -> cands.head
    }.toMap
    assert(!got.contains(9999L))
    got.foreach { case (i, (nn, d2)) =>
      assert(brute(i) == ((nn, d2)), s"point $i: got ($nn,$d2) want ${brute(i)}")
    }
    // every point whose true NN is within the final ring must be found
    val maxR = 16L * 8
    brute.foreach { case (i, (_, d2)) =>
      if (d2 <= maxR * maxR) assert(got.contains(i), s"point $i missing")
    }
  }

  test("kNearest: equals brute top-k; no partial lists from thin rings") {
    val pts = fixture
    val k = 3
    val got = GridJoin.kNearest(pts, "id", "x", "y", k, radius = 16L,
      maxRounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val all = pts.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    all.foreach { case (i, x, y) =>
      val brute = all.filter(_._1 != i)
        .map { case (j, bx, by) =>
          (j, (x - bx) * (x - bx) + (y - by) * (y - by)) }
        .sortBy { case (j, d2) => (d2, j) }.take(k)
      got.get(i) match {
        case Some(rows) =>
          // a resolved point must carry its FULL exact top-k, ranked
          assert(rows.length == k, s"partial list for $i")
          val sorted = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
          assert(sorted == brute.toSeq, s"point $i: $sorted vs $brute")
        case None =>
          // only legitimate when the k-th neighbor is beyond the last ring
          val maxR = 16L * 128
          assert(brute.size < k || brute.last._2 > maxR * maxR,
            s"point $i unresolved but k-th neighbor within range")
      }
    }
    assert(got.nonEmpty)
  }

  test("probe fan-out is exactly 9 cells per point") {
    val n = fixture.count()
    val probe = GridJoin.radiusJoin(
      fixture.select(col("id"), col("x"), col("y")),
      "x", "y",
      spark.range(0).select(col("id").as("rid"), lit(0L).as("rx"), lit(0L).as("ry")),
      "rx", "ry", radius = 100L)
    // empty build side → 0 result rows, but the probe explode itself is
    // what we bound: re-derive it the way the operator does.
    val fan = fixture
      .withColumn("cx", explode(sequence(
        ((col("x") - pmod(col("x"), lit(100L))) / 100L).cast("long") - 1,
        ((col("x") - pmod(col("x"), lit(100L))) / 100L).cast("long") + 1)))
      .withColumn("cy", explode(sequence(
        ((col("y") - pmod(col("y"), lit(100L))) / 100L).cast("long") - 1,
        ((col("y") - pmod(col("y"), lit(100L))) / 100L).cast("long") + 1)))
      .groupBy("id").count().select(max(col("count")), min(col("count")))
      .as[(Long, Long)].head()
    assert(fan == ((9L, 9L)))
    assert(probe.count() == 0)
    assert(n > 0)
  }
}
