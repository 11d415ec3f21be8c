package graft

import graft.functions.CosineSimilarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Seq(1.0, 0.0), Seq(0.0, 1.0)),
    (2L, Seq(1.0, 2.0), Seq(2.0, 4.0)),
    (3L, Seq(1.0, 0.0), Seq(-1.0, 0.0)),
    (4L, Seq(3.0, 4.0), Seq(4.0, 3.0))).toDF("id", "a", "b")

  test("native expression matches the fold formulation bit-for-bit") {
    def foldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def s(arr: org.apache.spark.sql.Column) =
        aggregate(arr, lit(0.0), (acc, v) => acc + v)
      s(zip_with(a, b, (x, y) => x * y)) /
        (sqrt(s(transform(a, x => x * x))) * sqrt(s(transform(b, x => x * x))))
    }
    val rows = df.select(CosineSimilarity($"a", $"b").as("native"),
      foldCosine($"a", $"b").as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val e = CosineSimilarity(
      Literal.create(Seq(3.0, 4.0), ArrayType(DoubleType)),
      Literal.create(Seq(4.0, 3.0), ArrayType(DoubleType)))
    assert(e.eval(null).asInstanceOf[Double] === 24.0 / 25.0)
  }

  test("nulls and length mismatch yield null") {
    val r = Seq((Seq(1.0), Option.empty[Seq[Double]]))
      .toDF("a", "b")
      .select(CosineSimilarity($"a", $"b")).collect()
    assert(r(0).isNullAt(0))
    val m = Seq((Seq(1.0, 2.0), Seq(1.0)))
      .toDF("a", "b")
      .select(CosineSimilarity($"a", $"b")).collect()
    assert(m(0).isNullAt(0))
  }

  test("rejects non-double-array inputs at analysis time") {
    val bad = Seq((1, "x")).toDF("a", "b")
    val e = intercept[Exception](
      bad.select(CosineSimilarity($"a", $"b")).collect())
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("foldable inputs constant-fold in the optimizer (native integration)") {
    // eval() is implemented, so Catalyst's ConstantFolding collapses the
    // whole expression to a literal — no runtime work survives in the plan
    val plan = spark.range(1)
      .select(CosineSimilarity(lit(Array(3.0, 4.0)), lit(Array(4.0, 3.0))).as("c"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("0.96"), s"expected folded literal in: $plan")
  }

  test("extensions register cosine_sim for plain SQL") {
    // getOrCreate() returns the suite's shared session (extensions apply
    // only at session creation) — detach it, build a fresh session on the
    // same SparkContext with the extensions, then restore.
    spark.version // force suite session init before detaching
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val v = ext.sql(
        "SELECT cosine_sim(array(3.0d, 4.0d), array(4.0d, 3.0d)) AS c")
        .collect()(0).getDouble(0)
      assert(v === 24.0 / 25.0)
      // the native aggregates resolve from SQL too
      val topk = ext.sql(
        """SELECT top_k_by_score(s, id, 2) AS t
          |FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS v(s, id)""".stripMargin)
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(topk.map(r => (r.getDouble(0), r.getLong(1))) === Seq((3.0, 2L), (2.0, 3L)))
      val mg = ext.sql(
        """SELECT misra_gries(w, 4) AS m
          |FROM VALUES ('a'), ('a'), ('b') AS v(w)""".stripMargin)
        .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(mg.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 2L), ("b", 1L)))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
