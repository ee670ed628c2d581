package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

/** Deterministic-sampling invariants: splits are disjoint+exhaustive,
  * stable across partitionings, and stratified sampling respects the
  * per-stratum fractions. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rows = (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else "es"))
    .toDF("id", "lang")

  test("hashSplit covers every row with exactly one split") {
    val out = Sampling.hashSplit(rows, "id",
      Seq("train" -> 0.8, "eval" -> 0.1, "test" -> 0.1))
    assert(out.count() == 2000)
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "eval", "test"))
    assert(counts.values.sum == 2000)
    // roughly proportional (hash-uniform): train within 75-85%
    assert(counts("train") > 1500 && counts("train") < 1700)
  }

  test("hashSplit assignment is stable under repartitioning") {
    val a = Sampling.hashSplit(rows, "id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(rows.repartition(7), "id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("md5Bucket: in range, stable, and uniform-ish") {
    val b = rows.select(Sampling.md5Bucket(col("id"), 10).as("b"))
      .as[Int].collect()
    assert(b.forall(x => x >= 0 && x < 10))
    // uniform-ish: every bucket hit, none over 2x the mean
    val hist = b.groupBy(identity).view.mapValues(_.length)
    assert(hist.size == 10 && hist.values.max < 400)
    // md5 family plugs into hashSplit and stays stable
    val m1 = Sampling.hashSplit(rows, "id", Seq("a" -> 0.5, "b" -> 0.5),
      bucketFn = Sampling.md5Bucket(_, _))
      .select("id", "split").as[(Long, String)].collect().toMap
    val m2 = Sampling.hashSplit(rows.repartition(5), "id",
      Seq("a" -> 0.5, "b" -> 0.5), bucketFn = Sampling.md5Bucket(_, _))
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(m1 == m2)
  }

  test("hashSplit rejects fractions that do not sum to 1") {
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(rows, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("stratifiedSample keeps ~fraction per stratum and drops unknown strata") {
    val out = Sampling.stratifiedSample(rows, "lang", "id",
      Map("en" -> 0.5))
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"))
    val n = out.count().toDouble
    val total = rows.filter($"lang" === "en").count().toDouble
    assert(n / total > 0.4 && n / total < 0.6)
    // deterministic: same rows every time
    assert(out.select("id").as[Long].collect().sorted.sameElements(
      Sampling.stratifiedSample(rows, "lang", "id", Map("en" -> 0.5))
        .select("id").as[Long].collect().sorted))
  }
}
