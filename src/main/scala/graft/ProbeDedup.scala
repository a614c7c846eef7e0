package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Tables, Text}

/** Scratch profiler for the near-dup pipeline (dev only). */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = Tables.documents(spark, d)
    time("count")(docs.count())
    time("real_query_1")(println("real=" + Text.queries("q_dedup_near")(spark, d).count()))
    time("real_query_2")(println("real=" + Text.queries("q_dedup_near")(spark, d).count()))
    time("lsh_pairs")(println("lsh=" + graft.engine.Vectors.queries("q_sim_pairs_lsh")(spark, d).count()))
    if (true) { spark.stop(); return }
    val toks = docs.withColumn("t", split(lower(col("text")), " "))
    time("tok_sizes")(toks.select(sum(size(col("t")))).collect())
    val sh = toks.withColumn("sh", array_distinct(transform(
      sequence(lit(1), greatest(size(col("t")) - 2, lit(1))),
      i => array_join(slice(col("t"), i, lit(3)), " "))))
    time("shingles")(sh.select(sum(size(col("sh")))).collect())
    val shash = sh.withColumn("shash",
      transform(col("sh"), x => xxhash64(x)))
    time("shash")(shash.select(sum(size(col("shash")))).collect())
    val sig = shash.withColumn("sig", transform(sequence(lit(0), lit(15)),
      k => array_min(transform(col("shash"), h => xxhash64(h, k)))))
    time("sig")(sig.select(sum(size(col("sig")))).collect())
    val sig2 = sig.select(col("doc_id"), col("sig")).repartition(col("doc_id"))
    val banded = sig2.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => hash(slice(col("sig"), b * 4 + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    time("banded")(banded.count())
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"))
    val joined = l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
    time("selfjoin_pairs")(println("pairs=" + joined.count()))
    val cands = joined.select("id_a", "id_b").distinct()
    time("cands")(println("cands=" + cands.count()))
    val sets = sh.select(col("doc_id"), col("sh"))
    val withA = cands.join(
      sets.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
    time("join_a")(withA.count())
    val withB = withA.join(
      sets.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
    time("join_b")(withB.count())
    val jac = withB.select(col("id_a"), col("id_b"),
      (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
        / size(array_union(col("sh_a"), col("sh_b")))).as("j"))
      .filter(col("j") >= 0.5)
    time("jaccard")(println("final=" + jac.count()))
    time("real_query")(println("real=" +
      Text.queries("q_dedup_near")(spark, d).count()))
    spark.stop()
  }
}
