package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan (and optionally
  * time) for one SparkEntry query. Usage:
  *   runMain graft.Explain <queryName> [sfDir] [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("time")) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(s"[explain] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}s")
      val t1 = System.nanoTime()
      val n2 = df.count()
      println(s"[explain] $name rows=$n2 warm in ${(System.nanoTime() - t1) / 1e9}s")
    }
    spark.stop()
  }
}
