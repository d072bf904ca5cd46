package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 check: builds a session,
  * runs `SparkEntry.entry`, prints row count + a few rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    require(n > 0, "entry() returned no rows")
    // extension-injected expressions resolve in SQL without registration
    val selfDot = spark.sql(
      "SELECT dot_f(array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS d").head.getDouble(0)
    println(s"[smoke] extension dot_f unit-vector self-dot=$selfDot")
    require(math.abs(selfDot - 1.0) < 1e-6, "extension function broken")
    // signature kernels resolve in SQL too; values must match the
    // driver-side reference implementations exactly
    val sigRow = spark.sql(
      "SELECT minhash_signature(array(7L, 42L), 4) AS mh, " +
        "simhash_signature(array(7L, 7L, 42L)) AS sh").head
    val mh = sigRow.getAs[scala.collection.Seq[Long]]("mh")
    val expected = (0 until 4).map { j =>
      Seq(7L, 42L).map(h =>
        (graft.functions.MinhashSignature.affineA(j) * h +
          graft.functions.MinhashSignature.affineB(j)) %
          graft.functions.MinhashSignature.Prime).min
    }
    println(s"[smoke] extension minhash_signature=$mh simhash=${sigRow.getAs[Long]("sh")}")
    require(mh == expected, s"minhash_signature mismatch: $mh vs $expected")
    require(sigRow.getAs[Long]("sh") == 7L,
      "simhash_signature majority vote broken")
    spark.stop()
  }
}
