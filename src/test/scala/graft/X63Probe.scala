package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: HLL inclusion-exclusion overlap vs the exact x61
  * rollup, per source pair — picks the gate's error bound. */
object X63Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.tune(SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val toks = Tables.documents(spark, dir)
      .select(col("source"),
        explode(expr(
          """transform(sequence(1, greatest(size(split(text, ' ')) - 1, 0)),
            |  i -> concat(element_at(split(text, ' '), i), ' ',
            |              element_at(split(text, ' '), i + 1)))""".stripMargin))
          .as("tok"))
    val sk = graft.ops.SketchOverlap.keySketches(toks, "source", "tok")
    val est = graft.ops.SketchOverlap.overlapMatrix(sk)
    val st = toks.distinct().persist()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val exact = st.as("a")
      .join(st.as("b"), col("a.tok") === col("b.tok") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("key_a"), col("b.source").as("key_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("source").as("key_a"), col("n").as("na")), Seq("key_a"))
      .join(sizes.select(col("source").as("key_b"), col("n").as("nb")), Seq("key_b"))
      .select(col("key_a"), col("key_b"), col("inter"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
    val joined = est.join(exact, Seq("key_a", "key_b"))
      .select(col("key_a"), col("key_b"), col("inter"), col("est_inter"),
        col("jaccard"), col("est_jaccard"),
        (abs(col("est_inter") - col("inter")).cast("double") /
          greatest(col("inter"), lit(1L))).as("rel_inter_err"),
        abs(col("est_jaccard") - col("jaccard")).as("abs_jac_err"))
      .orderBy(col("key_a"), col("key_b"))
    joined.show(100, truncate = false)
    joined.agg(max("rel_inter_err"), max("abs_jac_err")).show()
    spark.stop()
  }
}
