package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{BloomContainsProbe, CmsGeProbe, SketchProbeFunctions}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

import graft.SparkSpec

/** Probe expressions over serialized sketches: interpreted-vs-codegen
  * parity, the one-sided guarantees the exact second pass relies on,
  * null semantics, and content-based expression equality (an
  * Array[Byte] param with reference equals would defeat semanticEquals /
  * canonicalization — pinned here). */
class SketchProbeSpec extends SparkSpec {

  private def cmsBytes(values: Seq[Long], eps: Double = 0.01): Array[Byte] = {
    val cms = CountMinSketch.create(eps, 0.99, 42)
    values.foreach(v => cms.add(java.lang.Long.valueOf(v)))
    val out = new ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  private def bloomBytes(values: Seq[Long]): Array[Byte] = {
    val bf = BloomFilter.create(values.size.toLong.max(1), 0.01)
    values.foreach(bf.putLong)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  // skewed multiset: key k appears k times, k = 1..20
  private val skewed: Seq[Long] = (1L to 20L).flatMap(k => Seq.fill(k.toInt)(k))

  test("cms_ge: interpreted eval matches codegen'd DataFrame filter; one-sided") {
    val bytes = cmsBytes(skewed)
    val minCount = 10L

    // interpreted path: Expression.eval directly
    val expr = CmsGeProbe(BoundReference(0, LongType, nullable = true), bytes, minCount)
    val interpreted = (1L to 20L).filter(k => expr.eval(InternalRow(k)) == true)

    // codegen path: the same probe inside a whole-stage-codegen'd filter
    import spark.implicits._
    val codegen = (1L to 20L).toDF("key")
      .filter(SketchProbeFunctions.cmsGe(col("key"), bytes, minCount))
      .as[Long].collect().sorted.toSeq

    assert(interpreted === codegen)
    // one-sided: CMS never undercounts, so every truly-heavy key survives
    assert((10L to 20L).forall(interpreted.contains), s"lost a heavy key: $interpreted")
    // eval of a null input is null (nullIntolerant), i.e. filtered out
    assert(expr.eval(InternalRow(null)) == null)
  }

  test("bloom_contains: no false negatives; interpreted matches codegen") {
    val inserted = (0L until 500L).map(_ * 7L)
    val bytes = bloomBytes(inserted)

    val expr = BloomContainsProbe(BoundReference(0, LongType, nullable = true), bytes)
    assert(inserted.forall(v => expr.eval(InternalRow(v)) == true),
      "bloom filter returned a false negative")
    assert(expr.eval(InternalRow(null)) == null)

    import spark.implicits._
    val probes = (0L until 3500L)
    val codegen = probes.toDF("key")
      .filter(SketchProbeFunctions.bloomContains(col("key"), bytes))
      .as[Long].collect().toSet
    val interpreted = probes.filter(v => expr.eval(InternalRow(v)) == true).toSet
    assert(codegen === interpreted)
    assert(inserted.toSet.subsetOf(codegen))
  }

  test("string cms_ge probes bytes exactly as the built-in aggregate inserts") {
    import spark.implicits._
    // sketch trained by Spark's own count_min_sketch AGGREGATE over strings
    val rows = (1 to 20).flatMap(k => Seq.fill(k)(s"w$k"))
    val bytes = rows.toDF("s")
      .agg(count_min_sketch(col("s"), lit(0.01), lit(0.99), lit(42)))
      .head().getAs[Array[Byte]](0)
    // probe through the expression (codegen) — representation mismatch
    // between insert and probe would lose heavy keys, violating CMS's
    // no-undercount guarantee
    val survivors = (1 to 20).map(k => s"w$k").toDF("s")
      .filter(SketchProbeFunctions.cmsGe(col("s"), bytes, 10L))
      .as[String].collect().toSet
    assert((10 to 20).forall(k => survivors.contains(s"w$k")),
      s"heavy string key lost: $survivors")
    // interpreted parity
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val expr = CmsGeProbe(BoundReference(0, StringType, nullable = true), bytes, 10L)
    val interp = (1 to 20).map(k => s"w$k")
      .filter(w => expr.eval(InternalRow(UTF8String.fromString(w))) == true).toSet
    assert(interp === survivors)
  }

  test("string bloom_contains: no false negatives vs stat.bloomFilter build") {
    import spark.implicits._
    val hosts = (0 until 300).map(i => s"host-$i.example.com")
    val bf = hosts.toDF("h").stat.bloomFilter("h", 300, 0.01)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    val bytes = out.toByteArray
    val found = hosts.toDF("h")
      .filter(SketchProbeFunctions.bloomContains(col("h"), bytes))
      .as[String].collect().toSet
    assert(found === hosts.toSet, "bloom string probe lost inserted keys")
  }

  test("fractional keys fail analysis loudly; integral widths widen losslessly") {
    import spark.implicits._
    val bytes = cmsBytes(skewed)
    // ExpectsInputTypes (deliberately NOT ImplicitCastInputTypes): the
    // analyzer inserts no implicit cast, so a DOUBLE key is a loud
    // DATATYPE_MISMATCH analysis failure — never a silent truncation
    val exCms = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1.5, 2.0).toDF("k")
        .filter(SketchProbeFunctions.cmsGe(col("k"), bytes, 1L)).collect()
    }
    assert(exCms.getMessage.contains("DATATYPE_MISMATCH"))
    val exBloom = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(BigDecimal(2)).toDF("k")
        .filter(SketchProbeFunctions.bloomContains(col("k"), bloomBytes(Seq(2L))))
        .collect()
    }
    assert(exBloom.getMessage.contains("DATATYPE_MISMATCH"))
    // INT keys widen losslessly and agree with the long-typed probe
    val intSurvivors = (1 to 20).toDF("key")
      .filter(SketchProbeFunctions.cmsGe(col("key"), bytes, 10L))
      .as[Int].collect().map(_.toLong).sorted.toSeq
    val longSurvivors = (1L to 20L).toDF("key")
      .filter(SketchProbeFunctions.cmsGe(col("key"), bytes, 10L))
      .as[Long].collect().sorted.toSeq
    assert(intSurvivors === longSurvivors)
    val bBytes = bloomBytes((0L until 100L).toSeq)
    val intHits = (0 until 200).toDF("key")
      .filter(SketchProbeFunctions.bloomContains(col("key"), bBytes))
      .as[Int].collect().map(_.toLong).toSet
    val longHits = (0L until 200L).toDF("key")
      .filter(SketchProbeFunctions.bloomContains(col("key"), bBytes))
      .as[Long].collect().toSet
    assert(intHits === longHits)
    assert((0L until 100L).toSet.subsetOf(intHits), "int widening lost inserted keys")
  }

  test("probes compare by sketch CONTENT, not array reference") {
    val bytes = cmsBytes(skewed)
    val child = BoundReference(0, LongType, nullable = true)
    val a = CmsGeProbe(child, bytes, 5L)
    val b = CmsGeProbe(child, bytes.clone(), 5L) // distinct array object
    assert(a === b)
    assert(a.hashCode === b.hashCode)
    assert(a.semanticEquals(b), "structurally identical probes must canonicalize equal")
    assert(a !== CmsGeProbe(child, bytes, 6L))

    val fb = bloomBytes(Seq(1L, 2L, 3L))
    val x = BloomContainsProbe(child, fb)
    val y = BloomContainsProbe(child, fb.clone())
    assert(x === y)
    assert(x.hashCode === y.hashCode)
    assert(x.semanticEquals(y))
    assert(x !== BloomContainsProbe(child, bloomBytes(Seq(9L))))
  }
}
