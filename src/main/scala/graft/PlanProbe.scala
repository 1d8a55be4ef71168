import org.apache.spark.sql.SparkSession

/** Dev-only plan/time probe: runs the named registry queries at the given sf dir,
 * prints formatted physical plans and per-query timings (3 passes). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_interferogram")
    val spark = SparkSession.builder().master("local[32]")
      .appName("plan-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "131072")
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-tmp")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      if (sys.env.contains("PROBE_EXPLAIN")) { println(s"===== $n plan ====="); df.explain("formatted") }
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val cnt = df.count()
        println(f"[$n] pass$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$cnt")
      }
    }
  }
}
