package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev check: graft.GraftExtensions registers graft_dot via the
  * spark.sql.extensions config path (run in a fresh JVM). */
object ExtensionsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = spark.sql(
      "SELECT graft_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").collect()(0).getDouble(0)
    println(s"EXTENSIONS_DEMO graft_dot=(1,2)x(3,4)=$r expected=11.0 ok=${r == 11.0}")
    spark.stop()
  }
}
