package graft.tools

import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("scratch")
    val e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .filter(col("vec_id") <= 2)
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) v")
    val a = e.select(col("vec_id").as("ida"), col("v").as("va"))
    val b = e.select(col("vec_id").as("idb"), col("v").as("vb"))
    val r = a.join(b, col("ida") < col("idb")).select(col("ida"), col("idb"),
      expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, z) -> acc + z)").as("dot"))
    r.orderBy("ida", "idb").collect()
      .foreach(row => println(s"DOT ${row.getLong(0)},${row.getLong(1)},${row.getDouble(2)}"))
    // hash60 portability probe
    spark.sql("SELECT cast(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT) h")
      .collect().foreach(r2 => println(s"HASH ${r2.getLong(0)}"))
    spark.stop()
  }
}
