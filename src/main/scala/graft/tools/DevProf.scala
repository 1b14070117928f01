package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DevProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    import graft.operators.MinHashLsh._
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    t("shingles") { shingles(docs, "doc_id", "text").count() }
    val sh = shingles(docs, "doc_id", "text").cache()
    t("cache-materialize") { sh.count() }
    t("signatures") { signatures(sh, "doc_id").count() }
    val sig = signatures(sh, "doc_id").cache(); sig.count()
    t("candidates") { candidatePairs(sig, "doc_id").count() }
    t("end2end-again") { nearDupPairs(docs, "doc_id", "text", 0.5).count() }
    spark.stop()
  }
}
