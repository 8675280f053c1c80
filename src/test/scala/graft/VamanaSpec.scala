package graft

import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Vamana robust prune (the α-RNG rule) and the a29 walk over the
  * pruned graph: degree-cap law, the planted domination geometry,
  * and the panel condition that justifies shipping the prune —
  * recall at equal beam ≥ the raw NN-descent graph's. */
class VamanaSpec extends SparkSpec {

  import spark.implicits._

  test("robust prune: planted α-domination geometry keeps the diverse edge, drops the redundant one") {
    // p looks at three candidates: c1 (closest), c2 (nearly the same
    // direction as c1 — the α rule must drop it: a walk reaching c1
    // already covers it), c3 (the other side of p — kept even though
    // it is FARTHER, because no kept neighbor covers it)
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)),     // p
      (1L, Seq(0.99, 0.14)),   // c1
      (2L, Seq(0.98, 0.17)),   // c2: dominated by c1
      (3L, Seq(0.7, -0.714))   // c3: diverse, survives
    ).toDF("vec_id", "v")
    val g = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("q_id", "vec_id")
    val pruned = Knn.robustPrune(g, vecs, alpha = 1.2, degreeCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned.contains((0L, 1L)), "the closest candidate is always kept")
    assert(pruned.contains((0L, 3L)), "the diverse far candidate survives")
    assert(!pruned.contains((0L, 2L)), "the redundant near candidate is α-dominated")
  }

  test("pruned graph: degree cap holds, edges come from the candidate pool, top candidate always kept") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id",
        graft.functions.VectorFunctions.asDouble($"embedding").as("v"))
    val g = Knn.vamanaGraph(spark, sfDir)
    val maxDeg = g.groupBy($"q_id").agg(count(lit(1)).as("d"))
      .agg(max($"d")).head().getLong(0)
    assert(maxDeg <= 6, s"degree cap violated: $maxDeg")
    // every pruned edge must exist in the candidate pool (undirected
    // refined edges ∪ one neighbor-of-neighbor hop)
    val und = Knn.refinedGraph(spark, sfDir)
      .select($"q_id".as("node"), $"vec_id".as("nbr"))
      .unionByName(Knn.refinedGraph(spark, sfDir)
        .select($"vec_id".as("node"), $"q_id".as("nbr")))
    val non = und.as("x")
      .join(und.as("y"), $"x.nbr" === $"y.node" && $"y.nbr" =!= $"x.node")
      .select($"x.node".as("node"), $"y.nbr".as("nbr"))
    val pool = und.unionByName(non).filter($"node" =!= $"nbr")
      .dropDuplicates("node", "nbr")
      .select($"node".as("q_id"), $"nbr".as("vec_id"))
    assert(g.join(pool, Seq("q_id", "vec_id"), "left_anti").count() === 0,
      "pruned edges must come from the candidate pool")
    assert(vecs.count() > 0)
    Caches.releaseAll()
  }

  test("vamana insert: new nodes wired under the cap, untouched nodes bit-identical, dirty set = backlinked set") {
    val g0 = Knn.vamanaGraph(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g1rows = Knn.insertIntoVamana(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val g1 = g1rows.toSet
    val newIds = (0L until 8L).map(_ + 900000000L).toSet
    // every inserted node got out-edges, all pointing at OLD nodes
    val newOut = g1.filter(e => newIds(e._1))
    assert(newIds.forall(id => newOut.exists(_._1 == id)),
      "every inserted node must be wired")
    assert(newOut.forall(e => !newIds(e._2)),
      "insert out-edges point into the existing corpus")
    // degree cap holds everywhere after the patch
    val deg = g1rows.groupBy(_._1).map(_._2.length)
    assert(deg.max <= 6, s"degree cap violated: ${deg.max}")
    // the patch touches exactly the backlinked nodes; everyone else
    // passes through bit-identical
    val dirty = newOut.map(_._2)
    val untouched0 = g0.filter(e => !dirty(e._1))
    val untouched1 = g1.filter(e => !dirty(e._1) && !newIds(e._1))
    assert(untouched0 === untouched1,
      "nodes receiving no backlink must keep their exact edges")
    // every dirty node still has at least one edge and sees its
    // backlink pool (kept edges ⊆ old out-neighbors ∪ new ids)
    dirty.foreach { v =>
      val kept = g1.filter(_._1 == v).map(_._2)
      assert(kept.nonEmpty)
      val allowed = g0.filter(_._1 == v).map(_._2) ++ newIds
      assert(kept.subsetOf(allowed),
        s"dirty node $v kept an edge outside pool: ${kept -- allowed}")
    }
    Caches.releaseAll()
  }

  test("vamana delete: dead nodes vanish, dirty nodes re-prune under the α rule, untouched pass through") {
    val g0 = Knn.vamanaGraph(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g1 = Knn.a32VamanaDelete(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dead = Knn.GraphDeadIds.toSet
    assert(g1.forall(e => !dead(e._1) && !dead(e._2)),
      "no edge may reference a deleted node")
    // dirty = live nodes that pointed at a dead one
    val dirty = g0.collect { case (q, v) if dead(v) && !dead(q) => q }
    val untouched0 = g0.filter(e => !dirty(e._1) && !dead(e._1))
    assert(g1.filter(e => !dirty(e._1)) === untouched0.filter(e => !dead(e._2)),
      "nodes that never pointed at a dead node keep their exact edges")
    // every dirty node's patched edges come from survivors ∪ bridges
    dirty.foreach { q =>
      val keptNbrs = g1.filter(_._1 == q).map(_._2)
      assert(keptNbrs.nonEmpty, s"dirty node $q lost all edges")
      assert(keptNbrs.size <= 6)
      val bridges = g0.collect { case (`q`, v) if dead(v) => v }
        .flatMap(d => g0.collect { case (`d`, b) if !dead(b) && b != q => b })
      val allowed = g0.collect { case (`q`, v) if !dead(v) => v } ++ bridges
      assert(keptNbrs.subsetOf(allowed),
        s"dirty node $q kept an edge outside survivors ∪ bridges")
    }
    Caches.releaseAll()
  }

  test("a29 walk at a22's geometry: vamana recall >= raw graph recall") {
    val exact = Caches.persist(
      Knn.a1BruteForce(spark, sfDir).select($"q_id", $"vec_id"))
    val graphHits = Knn.a22GraphSearch(spark, sfDir)
      .select($"q_id", $"vec_id")
      .join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    val vamanaHits = Knn.a29VamanaSearch(spark, sfDir)
      .select($"q_id", $"vec_id")
      .join(exact, Seq("q_id", "vec_id"), "left_semi").count()
    assert(vamanaHits >= graphHits,
      s"vamana $vamanaHits < graph $graphHits at equal beam/hops")
    Caches.releaseAll()
  }
}
