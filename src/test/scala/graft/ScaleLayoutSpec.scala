package graft

import org.apache.spark.sql.functions._

/** Round-4 scale-layout family: bloom-prefiltered join, z-order skipping,
  * int8 embedding quantization. The oracle gates value-exactness; these
  * specs gate the properties the operators CLAIM — no false negatives,
  * bounded false positives, real block pruning, bounded reconstruction
  * error — which a hash-match alone wouldn't distinguish from luck. */
class ScaleLayoutSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("join_bloom_prefilter returns exactly the un-bloomed join's rows") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
    val bloomed = ops.Joins.joinBloomPrefilter(orders, cust).collect().toSeq
    val plain = orders
      .join(cust.filter(col("c_mktsegment") === "BUILDING"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"))
      .orderBy("o_orderkey").collect().toSeq
    assert(bloomed == plain, "bloom prefilter must be invisible in results")
    assert(bloomed.nonEmpty)
  }

  test("bloomPredicate: no false negatives, low false-positive rate on disjoint keys") {
    import spark.implicits._
    val build = (0L until 500L).toDF("k")
    val pred = ops.Joins.bloomPredicate(build, "k")
    // every build key passes (no false negatives — the exactness claim)
    assert(build.filter(pred(col("k"))).count() == 500)
    // disjoint probe range: expected FP rate (nk/m)^k = (500*4/65536)^4 ≈ 1e-6
    val probes = (1000000L until 1010000L).toDF("k")
    val fp = probes.filter(pred(col("k"))).count()
    assert(fp <= 10, s"false-positive rate too high: $fp/10000")
  }

  test("zorder skipping: the z layout prunes blocks the time layout cannot") {
    // sf0.001 has users 0..14 — probe one that exists (the declared query
    // probes 42 against sf0.01's 0..149)
    val out = sources.Layout.zorderSkipping(Tables.events(spark, sf),
        blockRows = 64, probeUser = 7L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (tBlocks, tHit, tRows) = out("time_sorted")
    val (zBlocks, zHit, zRows) = out("z_sorted")
    assert(tBlocks == zBlocks, "same data, same block size, same block count")
    assert(zHit < tHit, s"z-order must skip blocks the time sort cannot: z=$zHit t=$tHit")
    assert(zRows < tRows)
  }

  test("IVF-fronted ADC agrees with brute ADC on every scored distance") {
    val emb = Tables.embeddings(spark, sf)
    val ivf = ext.Similarity.simSearchIvfAdc(emb, k = 10).collect()
    assert(ivf.nonEmpty)
    // brute ADC with k ≥ corpus = the full ranking; every IVF-path score
    // must be bit-identical (the ADC core is the same arithmetic whether
    // candidates came from cells or from everywhere)
    val brute = ext.Similarity.simSearchPqAdc(emb, k = 100000).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(brute.get(key).contains(r.getLong(3)), s"ADC distance mismatch at $key")
    }
    // and within each query the ranking is by ascending distance
    ivf.groupBy(_.getLong(0)).values.foreach { rows =>
      val d = rows.sortBy(_.getLong(1)).map(_.getLong(3)).toSeq
      assert(d == d.sorted, s"ranking out of order: $d")
    }
  }

  test("bitmap distinct equals the exact per-class distinct count") {
    val events = Tables.events(spark, sf)
    val bitmap = ops.Aggs.aggBitmapDistinct(events)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = events.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bitmap == exact, s"bitmap=$bitmap exact=$exact")
  }

  test("refresh pipeline assigns all four dispositions on planted duplicates") {
    import spark.implicits._
    val good = ("alpha the beta of gamma and delta in epsilon to zeta " +
      "eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau")
    val df = Seq(
      (0L, good + " store copy", 120L),   // store side (even)
      (1L, good + " store copy", 120L),   // fresh, exact match in store
      (3L, good + " batch twin", 118L),   // fresh, first of a batch pair
      (5L, good + " batch twin", 118L),   // fresh, second → dup_batch
      (7L, "1111 2222 3333", 14L),        // fresh, digit-heavy → low_quality
      (9L, good, 108L)                    // fresh, clean → selected
    ).toDF("doc_id", "text", "n_chars")
    val out = ext.CorpusPrep.corpusRefreshPipeline(df)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(1L -> "dup_store", 3L -> "selected", 5L -> "dup_batch",
      7L -> "low_quality", 9L -> "selected"), out.toString)
  }

  test("emb_quantize_int8: q in ±127, err_l1 within the dim·scale/2 rounding bound") {
    val rows = ext.Similarity.embQuantizeInt8(Tables.embeddings(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (scale, qMin, qMax, err) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(5))
      assert(qMin >= -127 && qMax <= 127, s"q out of int8 range: [$qMin,$qMax]")
      // per-dim |q·scale − x| ≤ scale/2 (round-half-up, clamp never binds
      // because max|x| quantizes to exactly ±127) ⇒ L1 ≤ 64·scale/2
      assert(err <= 32.0 * scale + 1e-9, s"reconstruction error $err > ${32.0 * scale}")
    }
  }
}
