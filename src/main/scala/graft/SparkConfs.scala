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
  def kryoGraphConf(): SparkConf = {
    val conf = new SparkConf()
      .set("spark.serializer", sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
        "org.apache.spark.serializer.KryoSerializer"))
    org.apache.spark.graphx.GraphXUtils.registerKryoClasses(conf)
    conf
  }
}
