package graft

import graft.ext.Dedup
import graft.functions.{CosineSimilarity, SimHash64, SortedArrayJaccard}
import org.apache.spark.sql.functions._

/** Native-kernel semantics: the codegen'd expressions must agree with
  * the higher-order-function formulations they replaced. Randomized
  * with a FIXED seed — deterministic, but far wider than hand-picked
  * examples. */
class KernelSpec extends SparkSuite {
  import spark.implicits._

  private val words = Array("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")
  private def randomDocs(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Seq.fill(rnd.nextInt(31))(words(rnd.nextInt(words.length)))
      .mkString(" "))
  }

  test("SortedArrayJaccard == string-shingle HOF jaccard (randomized)") {
    val df = randomDocs(40, seed = 7).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val hashed = df.select($"doc_id",
      Dedup.hashedShingles($"text", 2).as("hs"),
      Dedup.shingles($"text", 2).as("sh"))
    val left = hashed.select($"doc_id".as("a"), $"hs".as("hsA"), $"sh".as("shA"))
    val right = hashed.select($"doc_id".as("b"), $"hs".as("hsB"), $"sh".as("shB"))
    val both = left.join(right, $"a" < $"b")
      .select(
        SortedArrayJaccard($"hsA", $"hsB").as("native"),
        try_divide(size(array_intersect($"shA", $"shB")).cast("double"),
          size(array_union($"shA", $"shB")).cast("double")).as("hof"))
      .collect()
    assert(both.length == 40 * 39 / 2)
    both.foreach { r =>
      // HOF 0/0 is null under try_divide; the native kernel is null too
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"native=${r.get(0)} hof=null")
      else assert(r.getDouble(0) == r.getDouble(1),
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
  }

  test("SortedArrayJaccard: disjoint 0, identical 1, empty-empty NULL") {
    val df = Seq(
      (Array(1L, 2L, 3L), Array(4L, 5L)),
      (Array(1L, 2L, 3L), Array(1L, 2L, 3L)),
      (Array.empty[Long], Array.empty[Long]))
      .toDF("a", "b")
    val out = df.select(SortedArrayJaccard($"a", $"b")).as[Option[Double]].collect()
    assert(out(0).contains(0.0) && out(1).contains(1.0))
    // NULL, not NaN: Spark sorts NaN ABOVE every number, so a NaN
    // would pass >= threshold filters and emit spurious dup pairs
    assert(out(2).isEmpty)
  }

  test("SimHash64 == 64-aggregate-HOF simhash (randomized)") {
    // the formulation Dedup.simhash used before the fused kernel
    def hofSimhash(text: org.apache.spark.sql.Column) = {
      val hashed = transform(split(trim(text), "\\s+"), x => xxhash64(x))
      (0 until 64).map { i =>
        val votes = aggregate(hashed, lit(0L),
          (acc, h) => acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L)
            .otherwise(-1L))
        when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }
    val df = randomDocs(50, seed = 11).filter(_.nonEmpty).toDF("text")
    val rows = df.select(Dedup.simhash($"text").as("fused"),
      hofSimhash($"text").as("hof")).as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (f, h) => assert(f == h) }
  }

  test("cosine_sim throws on mismatched vector lengths") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Throwable] {
      df.select(CosineSimilarity($"a", $"b")).collect()
    }
    assert(Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(5)
      .exists(_.getMessage.contains("length mismatch")))
  }

  test("cosine_sim zero-norm returns 0.0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(CosineSimilarity($"a", $"b")).as[Double].head() == 0.0)
  }
}
