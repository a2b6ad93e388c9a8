package graft

/** Dev probe (not a test): can Spark 4.1's parquet readers serve a file
  * written narrow (int/float) under a WIDER requested schema (long/
  * double), on both the vectorized and non-vectorized paths, with
  * pushed filters? Run: tools/run.sh graft.WideningProbe
  */
object WideningProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate(4)
    import spark.implicits._
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-widen").toString
    Seq((1, 1.5f, 10.toShort, 100.toByte),
        (2, 2.5f, 20.toShort, 101.toByte))
      .toDF("i", "f", "s", "b")
      .write.mode("overwrite").parquet(dir)
    val wide = StructType(Seq(
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("s", IntegerType), StructField("b", LongType)))
    val df = spark.read.schema(wide).parquet(dir)
    println("== plan ==")
    df.where($"i" > 1L).explain()
    val rows = df.where($"i" > 1L).collect()
    println(s"== rows == ${rows.mkString("; ")}")
    val all = df.collect()
    println(s"== all == ${all.mkString("; ")}")
    // double-widening of int
    val wide2 = StructType(Seq(StructField("i", DoubleType)))
    try {
      val r2 = spark.read.schema(wide2).parquet(dir).collect()
      println(s"== int->double == ${r2.mkString("; ")}")
    } catch { case e: Throwable => println(s"== int->double FAILS: ${e.getMessage}") }
    // non-vectorized path
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
    val r3 = spark.read.schema(wide).parquet(dir).where($"i" > 1L).collect()
    println(s"== non-vectorized == ${r3.mkString("; ")}")
    spark.conf.set("spark.sql.parquet.enableVectorizedReader", "true")
    spark.stop()
  }
}
