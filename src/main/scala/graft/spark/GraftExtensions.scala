package graft.spark

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.{CharStats, HashedBigramHistogram, HyperplaneSignature, MinHashSignature, UnicodeNormalize, WinnowSketch, WinnowSpans}
import graft.operators.AnnLsh

/** SQL surface for graft's custom Catalyst expressions.
  *
  * Registered either cluster-wide via
  * `--conf spark.sql.extensions=graft.spark.GraftExtensions` (the
  * standard extension-injection path — the class is instantiated per
  * session build) or imperatively on an existing session with
  * `GraftFunctions.register(spark)`.
  *
  * Exposed functions:
  *  - `hyperplane_signature(vec, nBits, dim[, seed])` — the loop-codegen'd
  *    random-hyperplane LSH signature ([[graft.functions.HyperplaneSignature]]);
  *    planes are derived deterministically from (nBits, dim, seed), so a
  *    SQL user gets the exact signatures the Scala API produces.
  *  - `minhash_signature(expr, k)` — single-buffer k-element MinHash
  *    aggregate ([[graft.functions.MinHashSignature]]): one pass, k longs
  *    per group across the shuffle.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos} must be an integer literal, got $other")
  }

  private def longArg(e: Expression, fn: String, pos: Int): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument ${pos} must be an integer literal, got $other")
  }

  private val hyperplaneBuilder: Seq[Expression] => Expression = {
    case Seq(child, nBits, dim) =>
      HyperplaneSignature(child, AnnLsh.hyperplanes(
        intArg(nBits, "hyperplane_signature", 2),
        intArg(dim, "hyperplane_signature", 3)))
    case Seq(child, nBits, dim, seed) =>
      HyperplaneSignature(child, AnnLsh.hyperplanes(
        intArg(nBits, "hyperplane_signature", 2),
        intArg(dim, "hyperplane_signature", 3),
        longArg(seed, "hyperplane_signature", 4)))
    case args => throw new IllegalArgumentException(
      s"hyperplane_signature expects (vec, nBits, dim[, seed]), got ${args.length} args")
  }

  private val minhashBuilder: Seq[Expression] => Expression = {
    case Seq(child, k) =>
      MinHashSignature(child, intArg(k, "minhash_signature", 2))
    case args => throw new IllegalArgumentException(
      s"minhash_signature expects (expr, k), got ${args.length} args")
  }

  private val winnowSketchBuilder: Seq[Expression] => Expression = {
    case Seq(child, k, w) =>
      WinnowSketch(child, intArg(k, "winnow_sketch", 2), intArg(w, "winnow_sketch", 3))
    case args => throw new IllegalArgumentException(
      s"winnow_sketch expects (text, k, w), got ${args.length} args")
  }

  private val winnowSpansBuilder: Seq[Expression] => Expression = {
    case Seq(child, k, w) =>
      WinnowSpans(child, intArg(k, "winnow_spans", 2), intArg(w, "winnow_spans", 3))
    case args => throw new IllegalArgumentException(
      s"winnow_spans expects (text, k, w), got ${args.length} args")
  }

  private val bigramHistBuilder: Seq[Expression] => Expression = {
    case Seq(child, buckets) =>
      HashedBigramHistogram(child, intArg(buckets, "hashed_bigram_histogram", 2))
    case args => throw new IllegalArgumentException(
      s"hashed_bigram_histogram expects (tokens, buckets), got ${args.length} args")
  }

  private val charStatsBuilder: Seq[Expression] => Expression = {
    case Seq(child) => CharStats(child)
    case args => throw new IllegalArgumentException(
      s"char_stats expects (text), got ${args.length} args")
  }

  private val unicodeNormalizeBuilder: Seq[Expression] => Expression = {
    case Seq(child) => UnicodeNormalize(child, "NFC")
    case Seq(child, Literal(f: org.apache.spark.unsafe.types.UTF8String, StringType)) =>
      UnicodeNormalize(child, f.toString)
    case args => throw new IllegalArgumentException(
      s"unicode_normalize expects (text[, form]), got ${args.length} args")
  }

  // sketch aggregates: the analyzer wraps a bare AggregateFunction from a
  // registry builder in an AggregateExpression, same as builtin aggs.
  // kmv_* hash through the same null-guarded xxhash64 the Column API uses
  // (xxhash64 of a NULL child returns the bare seed, which would count
  // null as a value).
  private def guardedHash(child: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.If(
      org.apache.spark.sql.catalyst.expressions.IsNull(child),
      Literal.create(null, LongType),
      org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(child), 42L))

  private val spaceSavingBuilder: Seq[Expression] => Expression = {
    case Seq(child, cap) =>
      graft.operators.SpaceSavingTopK(child, intArg(cap, "space_saving_topk", 2))
    case args => throw new IllegalArgumentException(
      s"space_saving_topk expects (key, capacity), got ${args.length} args")
  }

  private val kmvDistinctBuilder: Seq[Expression] => Expression = {
    case Seq(child, k) =>
      graft.operators.KmvDistinct(guardedHash(child), intArg(k, "kmv_distinct", 2))
    case args => throw new IllegalArgumentException(
      s"kmv_distinct expects (expr, k), got ${args.length} args")
  }

  private val kmvSketchBuilder: Seq[Expression] => Expression = {
    case Seq(child, k) =>
      graft.operators.KmvSketchAgg(guardedHash(child), intArg(k, "kmv_sketch", 2))
    case args => throw new IllegalArgumentException(
      s"kmv_sketch expects (expr, k), got ${args.length} args")
  }

  private val kmvMergeBuilder: Seq[Expression] => Expression = {
    case Seq(child, k) =>
      graft.operators.KmvMerge(child, intArg(k, "kmv_merge", 2))
    case args => throw new IllegalArgumentException(
      s"kmv_merge expects (sketch, k), got ${args.length} args")
  }

  /** (identifier, info, builder) triples in injectFunction's shape. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(classOf[graft.operators.SpaceSavingTopK].getName, "space_saving_topk"),
      spaceSavingBuilder),
    (FunctionIdentifier("kmv_distinct"),
      new ExpressionInfo(classOf[graft.operators.KmvDistinct].getName, "kmv_distinct"),
      kmvDistinctBuilder),
    (FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[graft.operators.KmvSketchAgg].getName, "kmv_sketch"),
      kmvSketchBuilder),
    (FunctionIdentifier("kmv_merge"),
      new ExpressionInfo(classOf[graft.operators.KmvMerge].getName, "kmv_merge"),
      kmvMergeBuilder),
    (FunctionIdentifier("char_stats"),
      new ExpressionInfo(classOf[CharStats].getName, "char_stats"),
      charStatsBuilder),
    (FunctionIdentifier("winnow_sketch"),
      new ExpressionInfo(classOf[WinnowSketch].getName, "winnow_sketch"),
      winnowSketchBuilder),
    (FunctionIdentifier("winnow_spans"),
      new ExpressionInfo(classOf[WinnowSpans].getName, "winnow_spans"),
      winnowSpansBuilder),
    (FunctionIdentifier("hashed_bigram_histogram"),
      new ExpressionInfo(classOf[HashedBigramHistogram].getName, "hashed_bigram_histogram"),
      bigramHistBuilder),
    (FunctionIdentifier("hyperplane_signature"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_signature"),
      hyperplaneBuilder),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_normalize"),
      unicodeNormalizeBuilder),
    (FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      minhashBuilder))

  /** Imperative registration on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    all.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
