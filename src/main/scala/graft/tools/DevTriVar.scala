package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for triangle-enumeration variants at a scale factor. */
object DevTriVar {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    def edges() = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
    }
    // variant: broadcast deg on both annotate joins
    def triB(edgesDf: DataFrame): DataFrame = {
      val e = edgesDf
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .distinct()
      val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val annotated = e
        .join(broadcast(deg.select(col("id").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("id").as("v"), col("deg").as("dv"))), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = annotated.select(
        when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"))
        .repartition(col("lo"))
      val adj = oriented.groupBy("lo").agg(collect_list(col("hi")).as("nbrs"))
      oriented
        .join(adj.select(col("lo"), col("nbrs").as("nx")), Seq("lo"))
        .join(adj.select(col("lo").as("hi"), col("nbrs").as("na")), Seq("hi"))
        .select(col("lo").as("x"), col("hi").as("a"),
          explode(array_intersect(col("nx"), col("na"))).as("w"))
        .select(sort_array(array(col("x"), col("a"), col("w"))).as("t"))
        .select(col("t").getItem(0).as("id_a"), col("t").getItem(1).as("id_b"),
          col("t").getItem(2).as("id_c"))
    }
    def time(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    // variant: broadcast the whole adjacency for both joins (no wedge
    // payload ever shuffles); valid when adj fits an executor broadcast
    def triC(edgesDf: DataFrame): DataFrame = {
      val e = edgesDf
        .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .distinct()
      val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val annotated = e
        .join(broadcast(deg.select(col("id").as("u"), col("deg").as("du"))), "u")
        .join(broadcast(deg.select(col("id").as("v"), col("deg").as("dv"))), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = annotated.select(
        when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"))
      val adj = oriented.groupBy("lo").agg(collect_list(col("hi")).as("nbrs"))
      oriented
        .join(broadcast(adj.select(col("lo"), col("nbrs").as("nx"))), Seq("lo"))
        .join(broadcast(adj.select(col("lo").as("hi"), col("nbrs").as("na"))), Seq("hi"))
        .select(col("lo").as("x"), col("hi").as("a"),
          explode(array_intersect(col("nx"), col("na"))).as("w"))
        .select(sort_array(array(col("x"), col("a"), col("w"))).as("t"))
        .select(col("t").getItem(0).as("id_a"), col("t").getItem(1).as("id_b"),
          col("t").getItem(2).as("id_c"))
    }
    def edgesNoDistinct() = {
      val li = spark.read.parquet(s"$d/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
    }
    def cur(): Unit = { graft.operators.Graph.triangles(edges(), "u", "v").queryExecution.toRdd.count(); () }
    def bro(): Unit = { triB(edges()).queryExecution.toRdd.count(); () }
    def both(): Unit = { triB(edgesNoDistinct()).queryExecution.toRdd.count(); () }
    def badj(): Unit = { triC(edges()).queryExecution.toRdd.count(); () }
    cur(); bro(); badj() // warm
    val a = Seq.fill(3)(time(cur))
    val b = Seq.fill(3)(time(bro))
    val c = Seq.fill(3)(time(badj))
    println(f"[trivar] current=${a.map(x => f"$x%.2f").mkString(",")} min=${a.min}%.2f  " +
      f"broadcastDeg=${b.map(x => f"$x%.2f").mkString(",")} min=${b.min}%.2f  " +
      f"broadcastAdj=${c.map(x => f"$x%.2f").mkString(",")} min=${c.min}%.2f")
    spark.stop()
  }
}
