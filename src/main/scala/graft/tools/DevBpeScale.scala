package graft.tools

import org.apache.spark.sql.SparkSession

/** Repro harness for the distributed-BPE 300-merge scale test: watches
  * logical-plan string size, persistent-RDD count, and heap across
  * rounds to pin down what grows. (Dev tool backing the plan-truncation
  * design in Bpe.trainDistributed.)
  */
object DevBpeScale {

  /** 400 deterministic pseudo-words (base-5 digits of a spread counter
    * mapped to letters, shared "ing" suffix): ~3k mergeable pairs —
    * rich enough to sustain 300 BPE merges, which the 31-distinct-word
    * testdata corpus is not. Shared by BpeSpec's 300-merge test so the
    * repro and the test can never drift apart. */
  def syntheticWords: Seq[String] = (0 until 400).map { i =>
    java.lang.Long.toString(100000L + i.toLong * 37L, 5)
      .map(c => ('a' + (c - '0')).toChar).mkString + "ing"
  }

  def syntheticDocs: Seq[String] =
    syntheticWords.grouped(40).map(_.mkString(" ")).toSeq

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("dev-bpe-scale")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = syntheticDocs.toDF("text")
    val t0 = System.nanoTime()
    val merges = graft.operators.Bpe.train(docs, "text", numMerges = 300,
      minPairFreq = 1L, localVocabLimit = 0L)
    println(s"merges=${merges.size} in ${(System.nanoTime()-t0)/1e9}s " +
      s"persistentRDDs=${spark.sparkContext.getPersistentRDDs.size}")
    spark.stop()
  }
}
