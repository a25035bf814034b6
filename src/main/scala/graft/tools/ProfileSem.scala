package graft.tools
import graft.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileSem {
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
      println(f"[profile] $name%-28s ${ts.head}%6.2f s  ${ts(1)}%6.2f s")
    }
    val emb = t.embeddings
    time("ivfIndex build") {
      Similarity.ivfIndex(emb, "vec_id", "embedding", 32, 2, 42L)
    }
    val idx = Similarity.ivfIndex(emb, "vec_id", "embedding", 32, 2, 42L)
    time("clusterPairs probes=3") {
      Similarity.clusterPairs(idx, "vec_id", "embedding", 0.45, 3)
        .write.format("noop").mode("overwrite").save()
    }
    val pairs = Similarity.clusterPairs(idx, "vec_id", "embedding", 0.45, 3)
    time("survivors (CC)") {
      Dedup.survivors(emb, pairs, "vec_id")
        .write.format("noop").mode("overwrite").save()
    }
    time("exactPairs") {
      Similarity.exactPairs(emb, "vec_id", "embedding", 0.45)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
