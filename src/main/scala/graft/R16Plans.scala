package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev/evidence utility for the r16 optimization round: dump the
  * formatted physical plan of named registry queries into
  * `plans/r16/<name>_<suffix>.txt` (default suffix `after`). The
  * matching `_before.txt` files are extracted from HEAD's PLANS.md
  * (regenerated at r15 close), so before/after pairs compare the
  * same corpus and explain mode.
  *
  * Usage: runMain graft.R16Plans <suffix> <query> [query...]
  */
object R16Plans {

  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mode = ExplainMode.fromString("formatted")
    Files.createDirectories(Paths.get("plans/r16"))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(mode)
      Caches.releaseAll()
      val clean = plan.trim.flatMap {
        case c if c == '\n' || c == '\t' || c >= ' ' => c.toString
        case c => f"\\x${c.toInt}%02x"
      }
      Files.writeString(Paths.get(s"plans/r16/${name}_$suffix.txt"),
        s"## $name\n\n```\n$clean\n```\n")
      println(s"[r16plans] wrote plans/r16/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
