package graft.tools
import graft.Tables
import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, sfDir)
    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[profile] $name%-30s ${ts.head}%6.2f s  ${ts(1)}%6.2f s")
    }
    val docs = t.documents
    val sh = Dedup.shingles(docs, "doc_id", "text", 3)
    time("shingles count") { println("  rows=" + sh.count()) }
    val shC = sh.persist(); shC.count()
    val sizes = Dedup.shingleSizes(shC, "doc_id")
    val docFreq = shC.groupBy(col("sh")).agg(count(lit(1)).as("sh_df"))
    time("docFreq agg") {
      docFreq.write.format("noop").mode("overwrite").save() }
    val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("sh_df"), col("sh"))
    val prefixLen = col("sh_n") - ceil(lit(0.5) * col("sh_n") - lit(1e-9)) + 1
    val prefixes = shC.join(docFreq, "sh")
      .withColumn("sh_pos", row_number().over(byRarity))
      .join(sizes, "doc_id")
      .filter(col("sh_pos") <= prefixLen && col("sh_df") >= 2)
      .select(col("doc_id"), col("sh"), col("sh_n"))
    time("prefixes") {
      println("  prefix rows=" + prefixes.count()) }
    val pC = prefixes.persist(); pC.count()
    val cands = pC.select(col("doc_id").as("id_a"), col("sh"), col("sh_n").as("n_a"))
      .join(pC.select(col("doc_id").as("id_b"), col("sh"), col("sh_n").as("n_b")), "sh")
      .filter(col("id_a") < col("id_b") &&
        lit(0.5) * greatest(col("n_a"), col("n_b")) <= least(col("n_a"), col("n_b")))
      .select(col("id_a"), col("id_b")).distinct()
    time("cands") { println("  cands=" + cands.count()) }
    val cC = cands.persist(); cC.count()
    val shCommon = shC.join(docFreq.filter(col("sh_df") >= 2).select(col("sh")),
      Seq("sh"), "left_semi")
    time("verify") {
      val common = cC
        .join(shCommon.select(col("doc_id").as("id_a"), col("sh")), "id_a")
        .join(shCommon.select(col("doc_id").as("id_b"), col("sh")), Seq("id_b", "sh"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("common"))
      common.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
