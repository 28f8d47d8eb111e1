package graft

import graft.functions.VecDot
import org.apache.spark.sql.functions._

/** The native dot-product kernel: bit-identical to the sequential
  * higher-order fold, null/mismatch semantics, codegen, SQL registration. */
class VecDotSpec extends GraftSuite {

  test("vec_dot is bit-identical to the aggregate(zip_with(...)) fold") {
    val e = Tables.embeddings(spark, sf)
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .withColumn("w", expr("reverse(v)"))
    val diff = e
      .withColumn("kernel", VecDot.of(col("v"), col("w")))
      .withColumn("fold", expr(
        "aggregate(zip_with(v, w, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"))
      // bit-identical, not approximately equal: both are the same
      // left-to-right fold
      .filter(col("kernel") =!= col("fold"))
      .count()
    assert(diff == 0)
  }

  test("NULL input yields NULL; length mismatch throws") {
    import spark.implicits._
    val row = Seq((Seq(1.0, 2.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(VecDot.of(col("a"), col("b")).as("d")).collect()(0)
    assert(row.isNullAt(0))
    val ex = intercept[Exception] {
      Seq((Seq(1.0, 2.0), Seq(1.0)))
        .toDF("a", "b")
        .select(VecDot.of(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage != null)
  }

  test("vec_dot is callable from SQL via GraftExtensions") {
    val got = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
      .collect()(0).getDouble(0)
    assert(got == 32.0)
  }
}
