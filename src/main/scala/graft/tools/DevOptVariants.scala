package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14 scratch: A/B variants for the winnow pair join and the triangle
  * edge build, run side-by-side against the current shapes. Results are
  * NOT oracle-checked here (parity is asserted by row counts only) —
  * winners get implemented behind the real queries and re-verified.
  * Not part of the driver contract.
  */
object DevOptVariants {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Tables.{documents, lineitem}

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(name: String)(f: => Unit): Unit = {
      f
      val runs = (0 until 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[var] $name%-40s min=${runs.min}%6.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }

    val k = 8; val w = 8
    val nP = spark.sessionState.conf.numShufflePartitions

    // --- winnow pair self-join variants ------------------------------
    def fps(bin: Boolean): DataFrame = {
      val raw = documents(spark, sfDir).select(col("doc_id"),
        explode(graft.functions.WinnowSketch(col("text"), k, w)).as("mh0"))
      val keyed = if (bin) raw.select(col("doc_id"), unhex(col("mh0")).as("mh"))
                  else raw.select(col("doc_id"), col("mh0").as("mh"))
      keyed.filter(col("doc_id").isNotNull && col("mh").isNotNull)
        .repartition(nP, col("mh"))
    }
    def pairAgg(fpsF: DataFrame, hint: String): DataFrame = {
      val b = hint match {
        case "merge" => fpsF.as("b").hint("SHUFFLE_MERGE")
        case "shuffle_hash" => fpsF.as("b").hint("SHUFFLE_HASH")
        case _ => fpsF.as("b")
      }
      fpsF.as("a").join(b,
          col("a.mh") === col("b.mh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .agg(count(lit(1)).as("n_shared"))
    }
    def winnowVariant(bin: Boolean, hint: String): DataFrame = {
      val f = fps(bin)
      val nDocs = documents(spark, sfDir).count()
      val dfCap = math.max(50L, nDocs / 10)
      val rare = f.groupBy("mh").agg(count(col("doc_id")).as("df"))
        .filter(col("df") > 1 && col("df") <= dfCap)
        .select("mh")
      pairAgg(f.join(rare, "mh"), hint)
    }
    println("[var] fps rows=" + fps(bin = false).count())
    time("winnow pairs hex + default join") { noop(winnowVariant(bin = false, "default")) }
    time("winnow pairs hex + shuffle_merge") { noop(winnowVariant(bin = false, "merge")) }
    time("winnow pairs hex + shuffle_hash") { noop(winnowVariant(bin = false, "shuffle_hash")) }
    time("winnow pairs BIN + default join") { noop(winnowVariant(bin = true, "default")) }
    time("winnow pairs BIN + shuffle_merge") { noop(winnowVariant(bin = true, "merge")) }
    time("winnow pairs BIN + shuffle_hash") { noop(winnowVariant(bin = true, "shuffle_hash")) }

    // --- triangle edge-build variants --------------------------------
    def edgeJoin: DataFrame = {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
    }
    def edgeGroup: DataFrame = {
      val li = lineitem(spark, sfDir).select("l_orderkey", "l_partkey")
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS u, y AS v))))"))
          .as("e"))
        .select(col("e.u"), col("e.v"))
        .distinct()
    }
    println("[var] edgeJoin=" + edgeJoin.count() + " edgeGroup=" + edgeGroup.count())
    time("tri edges via self-join") { noop(edgeJoin) }
    time("tri edges via groupBy+pairs") { noop(edgeGroup) }
    time("tri full, join edges") { noop(graft.operators.Graph.triangles(edgeJoin, "u", "v")) }
    time("tri full, group edges") { noop(graft.operators.Graph.triangles(edgeGroup, "u", "v")) }

    // adjacency broadcast variant of the triangle core
    def trianglesBcast(edges: DataFrame): DataFrame = {
      val e = edges
        .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
        .filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .distinct()
      val deg = e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val annotated = e
        .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val oriented = annotated.select(
        when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"))
        .repartition(col("lo"))
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
    time("tri full, group edges + bcast adj") { noop(trianglesBcast(edgeGroup)) }
    println("[var] tri rows cur=" +
      graft.operators.Graph.triangles(edgeJoin, "u", "v").count() +
      " bcast=" + trianglesBcast(edgeGroup).count())
    spark.stop()
  }
}
