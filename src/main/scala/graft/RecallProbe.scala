package graft

import org.apache.spark.sql.SparkSession
import graft.ext.Similarity

/** r13 (VERDICT r12 #3): measure the LSH escapes' recall as a function of
  * the sign-bucket width — the record behind the derived-bits trade. The
  * declared queries (`sim_knn_lsh_recall`, `dedup_embedding_lsh_recall`)
  * read the recall at the DERIVED width; this probe sweeps pinned widths
  * around it so the next decade's derived step (bits 6 → 8 at sf30) has a
  * measured recall cost, not an extrapolated one.
  *
  * Usage: runMain graft.RecallProbe <sfDir> [bitsList]
  * Prints one JSON line per (form, bits) point; exact frames are built
  * once and persisted (every sweep point joins against them). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val bitsList = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(0, 6, 8, 10, 12) // 0 = derived
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val derived = Similarity.lshBitsFor(n)

    val exactPairs = Similarity.dedupEmbeddingCosine(emb)
      .select("vec_a", "vec_b").persist()
    val nExact = exactPairs.count()
    val exactKnn = Similarity.simKnnJoin(emb)
      .select("vec_id", "neighbor_id").persist()
    val kTot = exactKnn.count()

    for (b0 <- bitsList.map(b => if (b == 0) derived else b).distinct) {
      // pair form: LSH pairs are a SUBSET of exact pairs (shared threshold,
      // exact cosine inside the bucket) — n_lsh IS the overlap; the
      // declared query proves that via a full-outer join, the probe leans
      // on it for one count per point
      val nLsh = Similarity.dedupEmbeddingCosineLsh(emb, bits = b0).count()
      println(f"""{"form":"pair","sf":"$sfDir","n":$n,"bits":$b0,"derived":${b0 == derived},"n_exact":$nExact,"n_lsh":$nLsh,"pair_recall":${nLsh.toDouble / math.max(1L, nExact)}%.4f}""")
      val lshKnn = Similarity.simKnnJoinLsh(emb, bits = b0)
        .select("vec_id", "neighbor_id")
      val ov = exactKnn.join(lshKnn, Seq("vec_id", "neighbor_id"), "left_semi").count()
      println(f"""{"form":"knn","sf":"$sfDir","n":$n,"bits":$b0,"derived":${b0 == derived},"k_total":$kTot,"n_overlap":$ov,"recall":${ov.toDouble / math.max(1L, kTot)}%.4f}""")
    }
    spark.stop()
  }
}
