package graft
import org.apache.spark.sql.SparkSession
object GlobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("/root/testdata/sf0.01/events*.parquet", "/tmp/graft_sf1/events*.parquet").foreach { g =>
      val r = try s"ok rows=${spark.read.parquet(g).count()}"
              catch { case e: Throwable => s"${e.getClass.getSimpleName}: ${e.getMessage.take(120)}" }
      println(s"[glob] $g -> $r")
    }
    spark.stop()
  }
}
