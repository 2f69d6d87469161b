package graft

import graft.operators.Dedup
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class DotExactSpec extends SparkSpec {

  test("native dot_exact: exact decimal sum, round-9 identical to the HOF fold") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    // Self-dots plus shifted cross-dots exercise many magnitudes.
    val shifted = emb.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("vec_id")))
    val pairs = shifted.alias("a").join(shifted.alias("b"),
        col("a.rn") === col("b.rn") + 1)
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    val out = pairs.select(col("x"), col("y"),
        call_function("dot_exact", col("x"), col("y")).as("native"),
        Dedup.dotExactHof(col("x"), col("y")).as("hof"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      // Driver-side exact reference: per-term double product → scale-18
      // HALF_UP decimal → exact sum (what DuckDB's decimal SUM computes).
      val xs = r.getSeq[Float](0); val ys = r.getSeq[Float](1)
      val expect = xs.zip(ys).foldLeft(java.math.BigDecimal.ZERO) {
        case (acc, (a, b)) => acc.add(java.math.BigDecimal
          .valueOf(a.toDouble * b.toDouble)
          .setScale(18, java.math.RoundingMode.HALF_UP))
      }.doubleValue
      assert(r.getDouble(2) == expect,
        s"native=${r.getDouble(2)} expected=$expect")
      // The HOF fold loses one digit per merge step (decimal + promotes
      // (38,18)→(38,17)), so agreement is at the 9-decimal contract the
      // operators cut on, not bit-for-bit.
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 1e-12,
        s"native=${r.getDouble(2)} hof=${r.getDouble(3)}")
    }
  }

  test("null elements and length mismatch contribute zero; null array is null") {
    val d = df("x ARRAY<FLOAT>, y ARRAY<FLOAT>",
      Row(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, null, 6.0f)), // null element
      Row(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f, 5.0f)),       // ragged
      Row(null, Seq(1.0f)))                              // null side
    val out = d.select(
        call_function("dot_exact", col("x"), col("y")).as("native"),
        Dedup.dotExactHof(col("x"), col("y")).as("hof"))
      .collect()
    assert(out(0).getDouble(0) == 4.0 + 18.0)
    assert(out(1).getDouble(0) == 3.0 + 8.0)
    assert(out(2).isNullAt(0))
    // HOF differential agrees on every non-null case.
    assert(out(0).getDouble(0) == out(0).getDouble(1))
    assert(out(1).getDouble(0) == out(1).getDouble(1))
    assert(out(2).isNullAt(1))
  }

  test("NaN and Infinity elements contribute zero, like the HOF cast-to-null path") {
    val d = df("x ARRAY<FLOAT>, y ARRAY<FLOAT>",
      Row(Seq(Float.NaN, 2.0f), Seq(3.0f, 4.0f)),
      Row(Seq(Float.PositiveInfinity, 1.0f), Seq(1.0f, 5.0f)))
    val out = d.select(
        call_function("dot_exact", col("x"), col("y")).as("native"),
        Dedup.dotExactHof(col("x"), col("y")).as("hof"))
      .collect()
    assert(out(0).getDouble(0) == 8.0)   // NaN*3 skipped, 2*4 kept
    assert(out(1).getDouble(0) == 5.0)   // Inf*1 skipped, 1*5 kept
    assert(out(0).getDouble(0) == out(0).getDouble(1))
    assert(out(1).getDouble(0) == out(1).getDouble(1))
  }

  test("dot_exact stays inside whole-stage codegen on a real scan") {
    val emb = Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = emb.select(
        call_function("dot_exact", col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"),
      s"dot_exact must stay inside whole-stage codegen:\n$plan")
  }
}
