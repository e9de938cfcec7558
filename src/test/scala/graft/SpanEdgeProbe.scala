package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev A/B probe for the spanEdges build shape (all df-capped):
  *
  *   - `cset`  — groupBy collect_set + HOF pair explosion (one wide
  *     shuffle through ObjectHashAggregate, pairs expand in-expr)
  *   - `csort` — cset with ONE sort_array up front (pairs emit
  *     (ds[i], ds[j]) directly, no per-pair least/greatest structs)
  *   - `join`  — df count agg + semi-join + self-join (three narrow
  *     shuffles, every operator whole-stage codegen)
  *
  * Interleaved sweeps, min per variant (sandbox noise ~3x). */
object SpanEdgeProbe {
  private val W = 4
  private val Cap = 64

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def spans(s: SparkSession): DataFrame =
      Tables.documents(s, dir).select(col("doc_id"),
        explode(graft.functions.SpanHashes.spanHashes(col("text"), W)).as("sh"))

    def cset(): DataFrame =
      spans(spark).groupBy(col("sh"))
        .agg(collect_set(col("doc_id")).as("ds"))
        .filter(size(col("ds")).between(2, Cap))
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ds) - 2),
            |  i -> transform(sequence(i + 1, size(ds) - 1),
            |    j -> struct(least(ds[i], ds[j]) AS a,
            |                greatest(ds[i], ds[j]) AS b))))""".stripMargin))
          .as("p"))
        .select(col("p.a"), col("p.b")).distinct()

    def csort(): DataFrame =
      spans(spark).groupBy(col("sh"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
        .filter(size(col("ds")).between(2, Cap))
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ds) - 2),
            |  i -> transform(sequence(i + 1, size(ds) - 1),
            |    j -> struct(ds[i] AS a, ds[j] AS b))))""".stripMargin))
          .as("p"))
        .select(col("p.a"), col("p.b")).distinct()

    def joinShape(): DataFrame = {
      val sp = spans(spark)
      val kept = sp.groupBy(col("sh")).agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, Cap)).select(col("sh"))
      val fs = sp.join(kept, Seq("sh"))
      fs.select(col("sh"), col("doc_id").as("a"))
        .join(fs.select(col("sh"), col("doc_id").as("b")), Seq("sh"))
        .filter(col("a") < col("b"))
        .select(col("a"), col("b")).distinct()
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "cset" -> (() => cset()),
      "csort" -> (() => csort()),
      "join" -> (() => joinShape()))
    val runs = sys.env.get("PROFILE_RUNS").map(_.toInt).getOrElse(3)
    val times = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (r <- 1 to runs; (name, f) <- variants) {
      val t0 = System.nanoTime()
      val n = f().count()
      val t = (System.nanoTime() - t0) / 1e9
      times(name) = t :: times(name)
      println(f"run$r $name%-6s $t%6.2f s  ($n edges)")
    }
    for ((name, _) <- variants)
      println(f"MIN $name%-6s ${times(name).min}%6.2f s  (all: ${
        times(name).reverse.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
