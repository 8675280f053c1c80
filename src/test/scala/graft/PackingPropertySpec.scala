package graft

import org.scalacheck.Gen
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.operators.{Packing, Robots}

/** Property-based checks (ScalaCheck generators, deterministic
  * seeds): the distributed kernels vs straight-line reference
  * implementations on random inputs — the invariants example-based
  * specs can't sweep. */
class PackingPropertySpec extends SparkSpec with TableDrivenPropertyChecks {

  import spark.implicits._

  private val cap = 100L

  /** Straight-line next-fit over one group's ordered stream. */
  private def refPack(sizes: Seq[Long], cap: Long): Seq[(Long, Long, Boolean)] = {
    var bin = 0L; var fill = 0L
    sizes.map { sz =>
      if (fill > 0 && fill + sz > cap) { bin += 1; fill = 0L }
      val off = fill; fill += sz
      (bin, off, sz > cap)
    }
  }

  test("packNextFit == sequential reference on random multi-group streams") {
    val gen = for {
      nGroups <- Gen.choose(1, 6)
      rows <- Gen.listOfN(120, for {
        g <- Gen.choose(0, nGroups - 1)
        sz <- Gen.frequency(
          (6, Gen.choose(0L, 60L)),     // normal items
          (2, Gen.choose(60L, 120L)),   // near-cap
          (1, Gen.choose(120L, 400L)))  // oversize
      } yield (s"g$g", sz))
    } yield rows
    (0 until 8).foreach { i =>
      val rows = gen
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(42L + i), 10)
        .zipWithIndex.map { case ((g, sz), ord) => (g, ord.toLong, sz) }
      val got = Packing
        .packNextFit(rows.toDF("grp", "ord", "sz").repartition(5),
          Seq("grp"), Seq("ord"), "sz", cap)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
      rows.groupBy(_._1).foreach { case (g, items) =>
        val ordered = items.sortBy(_._2)
        refPack(ordered.map(_._3), cap).zip(ordered).foreach {
          case (expect, (_, ord, _)) =>
            assert(got((g, ord)) === expect,
              s"group $g ord $ord diverges (case $i)")
        }
      }
    }
  }

  /** Straight-line RFC evaluation: longest matching prefix, allow
    * beats disallow on ties, default allowed. */
  private def refAllowed(path: String,
                         rules: Seq[(String, String)]): Boolean = {
    val hits = rules.filter { case (_, p) => path.startsWith(p) }
    if (hits.isEmpty) true
    else {
      val maxLen = hits.map(_._2.length).max
      hits.filter(_._2.length == maxLen).exists(_._1 == "allow")
    }
  }

  test("robots evaluate == straight-line RFC reference on random rule sets") {
    val segGen = Gen.oneOf("a", "b", "c", "d")
    val pathGen = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, segGen).map(_.mkString("/", "/", "")))
    val gen = for {
      nRules <- Gen.choose(1, 8)
      rules <- Gen.listOfN(nRules, for {
        t <- Gen.oneOf("allow", "disallow")
        p <- pathGen
      } yield (t, p))
      urls <- Gen.listOfN(20, pathGen)
    } yield (rules.distinct, urls.distinct)
    (0 until 6).foreach { i =>
      val (rules, paths) = gen
        .pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(7L + i), 10)
      val robotsTxt = ("User-agent: *" +: rules.map { case (t, p) =>
        s"${t.capitalize}: $p" }).mkString("\n")
      val parsed = Robots.parseRobots(
        Seq(("h.com", robotsTxt)).toDF("host", "robots_txt"))
      val frontier = paths.map(p => s"https://h.com$p").toDF("url")
      val got = Robots.evaluate(frontier, parsed)
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      paths.foreach { p =>
        assert(got(s"https://h.com$p") === refAllowed(p, rules),
          s"case $i: $p vs rules $rules")
      }
    }
  }
}
