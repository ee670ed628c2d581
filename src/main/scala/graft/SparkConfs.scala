package graft

import org.apache.spark.SparkConf

/** Shared session tuning for the driver-contract mains (Bench /
  * Verify / Profile): Kryo with GraphX's classes registered.
  * GraphX kernels (Pregel/CC/SCC/PageRank) shuffle RDD records that
  * Java serialization handles ~2x slower; without registration Kryo
  * writes fully-qualified class names per record and forfeits much of
  * that win. SQL/Tungsten paths are unaffected (UnsafeRow is already
  * binary). */
object SparkConfs {

  /** Rows below which an iterative operator's rounds run WITHOUT
    * whole-stage codegen: every round's plan is structurally unique
    * (fresh checkpoint RDD ids + round literals), so the codegen cache
    * never hits and Janino compiles ~100ms of bytecode per stage per
    * round — more than a small round's interpreted execution costs.
    * Big inputs keep codegen (it amortizes over real data volume).
    * Shared by the DataFrame BFS loops and the Lloyd rounds. */
  val InterpretedRows = 20000000L

  /** Run `body` (an iterative operator's actions) without whole-stage
    * codegen when `rows` of per-round work sit under
    * [[InterpretedRows]]: every round's plan is structurally unique
    * (fresh checkpoint RDD ids + round literals), so the codegen cache
    * never hits and Janino compiles ~100ms of bytecode per stage per
    * round — more than a small round's interpreted execution costs.
    * Big inputs keep codegen (it amortizes over real data volume).
    *
    * MEASURED NEGATIVE: also disabling AQE here looked like a 43% win
    * on a cold-JVM scoped BFS subset (36.0s → 18.1s) but regressed the
    * warm full bench 94s → 108s — AQE's per-round re-planning cost is
    * driver CPU that JIT warms away, while the loops WITHOUT explicit
    * broadcast hints (KMV centrality, pivot betweenness, Lloyd rounds)
    * depend on AQE's runtime broadcast conversion and fell back to
    * sort-merge without it (g37 ×2.5, g41 ×2.2, x22 ×1.6). Keep AQE
    * on; only codegen is worth gating per-round.
    *
    * The conf flip is session-global for the duration — same
    * single-threaded assumption the per-session graph caches make. */
  def maybeInterpreted[A](spark: org.apache.spark.sql.SparkSession,
                          rows: Long)(body: => A): A = {
    val key = "spark.sql.codegen.wholeStage"
    if (rows < 0 || rows >= InterpretedRows) body
    else {
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try body finally spark.conf.set(key, prev)
    }
  }

  /** Run `body` with Catalyst constraint propagation off. The
    * self-referential union shape of iterative pair-state loops
    * (state ∪ fresh where fresh's plan references state's attributes
    * through an anti-join) trips `UnionBase.rewriteConstraints` on
    * Spark 4.1 (NoSuchElementException on a deduplicated-join
    * attribute) for join-derived inputs. Constraint propagation only
    * infers extra filters — losing it inside a bounded loop costs
    * nothing measurable, and every checkpoint the loop takes
    * materializes inside this scope. */
  def withoutConstraintPropagation[A](spark: org.apache.spark.sql.SparkSession)
                                     (body: => A): A = {
    val key = "spark.sql.constraintPropagation.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }

  def kryoGraphConf(): SparkConf = {
    val conf = new SparkConf()
      .set("spark.serializer", sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
        "org.apache.spark.serializer.KryoSerializer"))
    org.apache.spark.graphx.GraphXUtils.registerKryoClasses(conf)
    conf
  }
}
