package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway tuning harness (not part of the library): recall@1 vs
  * scan-fraction for fitted-KMeans IVF at several K, to pick the
  * default operating point. Run:
  *   sbt "Test/runMain graft.TuneIvf /root/testdata/sf0.1"
  */
object TuneIvf {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local("tune-ivf", defaultCpus = "16")
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding"),
        graft.functions.Fns.normSq(col("embedding")).as("nsq"))
      .cache()
    val total = e.count().toDouble
    println(s"n_vectors = $total")

    val q = e.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("nsq").as("q_nsq"))
    val bf = q.crossJoin(e.select(col("vec_id").as("n_id"),
        col("embedding").as("n_emb"), col("nsq").as("n_nsq")))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (graft.functions.Fns.dotProduct(col("q_emb"), col("n_emb"))
          / (sqrt(col("q_nsq")) * sqrt(col("n_nsq")))).as("cos"))
      .groupBy("q_id")
      .agg(min_by(struct(col("n_id"), col("cos")), struct(-col("cos"), col("n_id"))).as("x"))
      .select(col("q_id"), col("x.n_id").as("bf_id"))
      .cache()
    bf.count()

    for (k <- Seq(16, 32, 64)) {
      val fv = e.select(col("vec_id"),
        org.apache.spark.ml.functions.array_to_vector(col("embedding")).as("fv"))
      val centers = new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(42).setMaxIter(20)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(fv).clusterCenters.map(_.toArray)
      def nearestCell(emb: org.apache.spark.sql.Column) =
        array_min(array(centers.zipWithIndex.map { case (c, i) =>
          struct(graft.plans.TextVectorExprs.l2Sq(emb, typedLit(c)).as("dist"),
            lit(i).as("cell"))
        }: _*)).getField("cell")
      val inv = e.select(col("vec_id").as("n_id"), nearestCell(col("embedding")).as("cell"))
      val cellSizes = inv.groupBy("cell").agg(count(lit(1)).as("cell_n"))
      val qRanks = q.select(col("q_id"), explode(array(centers.zipWithIndex.map {
          case (c, i) => struct(lit(i).as("cell"),
            graft.plans.TextVectorExprs.l2Sq(col("q_emb"), typedLit(c)).as("dist"))
        }: _*)).as("c"))
        .select(col("q_id"), col("c.cell"), col("c.dist"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
        .select("q_id", "cell", "rnk")
      val tr = bf.join(inv, col("bf_id") === col("n_id")).join(qRanks, Seq("q_id", "cell"))
        .select("q_id", "rnk").collect().map(r => r.getInt(1)).sorted
      val scan = qRanks.join(cellSizes, Seq("cell"))
        .select("q_id", "rnk", "cell_n").collect()
        .groupBy(_.getInt(1)).view.mapValues(_.map(_.getLong(2)).sum / 100.0).toMap
      val probes = Seq(1, 2, 4, 8, 12, 16, 24, 32).filter(_ <= k)
      probes.foreach { p =>
        val recall = tr.count(_ <= p) / 100.0
        val scanned = (1 to p).map(r => scan.getOrElse(r, 0.0)).sum / total
        println(f"K=$k%3d nprobe=$p%3d recall@1=$recall%.2f scan_frac=$scanned%.3f")
      }
    }
    spark.stop()
  }
}
