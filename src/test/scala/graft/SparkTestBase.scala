package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One lazy SparkSession shared per suite (guide: one session per suite).
  * local[4] + 4 shuffle partitions keeps test latency low; production
  * sizing is the caller's concern (Verify/Bench read SPARK_GRAFT_CPUS).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  def sf(name: String): String = s"/root/testdata/$name"
  val sf0001 = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val session: SparkSession = {
    // per-process unique warehouse (ADVICE r3: a fixed /tmp path let two
    // concurrent test JVMs wipe each other's tables mid-run), deleted on
    // JVM shutdown so /tmp does not accumulate across runs
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(wh.toFile)
    }))
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // keep saveAsTable artifacts (StorageLayoutSpec) out of the repo
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
