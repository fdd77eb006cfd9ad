package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: JIT + codegen + parquet footer caches, so the first timed
    // query measures the query, not JVM startup.
    try Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().count()
    catch { case _: Throwable => () }
    // Each query runs `reps` times; the headline number is the per-query
    // MIN (steady-state plan cost). Rep 1 is reported separately as
    // "cold": the first execution of a unique plan pays whole-stage-
    // codegen compilation + JIT, which in round 3 inflated single-shot
    // numbers up to 20x vs warm reality (q63: 26.1 s cold-reported,
    // 1.4 s warm re-measured) — the 2x-of-baseline gate must compare
    // engine cost, not JVM compilation noise.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times =
        try {
          (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            val dt = (System.nanoTime() - t0) / 1e9
            // A query's leaked cache must never bill (or subsidize) a
            // later rep or a later query (r3 artifact — cross-query
            // interference in the q6x group), and a query that caches
            // internally (q95) must pay its real scan every rep.
            spark.catalog.clearCache()
            dt
          }
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          spark.catalog.clearCache()
          Seq.empty[Double]
        }
      name -> times
    }
    def jmap(f: Seq[Double] => Double) = results
      .map { case (k, ts) => s"\"" + k + "\":" + (if (ts.isEmpty) -1.0 else f(ts)) }
      .mkString("{", ",", "}")
    val qs = jmap(_.min)
    val cold = jmap(_.head)
    val total = results.collect { case (_, ts) if ts.nonEmpty => ts.min }.sum
    // failures must not read as a speedup: excluded queries (-1 in the
    // per-query map) are surfaced as an explicit count in the headline
    val failed = results.count(_._2.isEmpty)
    println(s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,"failed":$failed,"queries":$qs,"cold":$cold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
