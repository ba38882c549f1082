package graft.tools
import org.apache.spark.sql.SparkSession
object DecimalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.sql(
      """SELECT CAST('99999999999999999999999999' AS DECIMAL(38,0)) div
        | CAST(7 AS DECIMAL(38,0)) AS q1,
        | CAST('123456789012345678901234' AS DECIMAL(38,0)) div
        | CAST(1000000 AS DECIMAL(38,0)) AS q2""".stripMargin)
    df.printSchema(); df.show(false)
    spark.stop()
  }
}
