package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.model.Schemas

/** Schema drift (SURVEY.md §7.3): airwise_datav1 has two writer
  * generations — a 14-column writer (AIRWISEv1.py:233) and a 12-column
  * writer without bus_voltage/current_mA (AIRWISEv0v1comb.py:272) —
  * appending to one table. The nullable-superset schema + mergeSchema
  * read must reconcile them. */
class SchemaDriftSpec extends SparkSpec {
  import spark.implicits._

  test("12-col and 14-col writer generations reconcile under mergeSchema") {
    val dir = Files.createTempDirectory("graft_drift").toString
    val full = Seq((1L, "t1", "Farm1", 20.0, 40.0, 1000.0, 50000.0,
      1.0, 2.0, 3.0, 5.0, 150.0, 1760748340L, "2025-10-17 18:25:53 PDT"))
      .toDF(Schemas.airwiseDataV1.fieldNames: _*)
    val reduced = full.drop("bus_voltage", "current_mA")
    full.write.parquet(s"$dir/t/gen=v1")
    reduced.write.parquet(s"$dir/t/gen=comb")
    val back = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(Schemas.airwiseDataV1.fieldNames.toSet.subsetOf(back.columns.toSet))
    assert(back.count() == 2)
    val comb = back.filter(col("gen") === "comb").collect().head
    assert(comb.getAs[Any]("bus_voltage") == null)   // absent column -> NULL
    assert(comb.getAs[Double]("temperature") == 20.0)
    val v1 = back.filter(col("gen") === "v1").collect().head
    assert(v1.getAs[Double]("bus_voltage") == 5.0)
  }

  test("unionByName with allowMissingColumns models the mixed daemon writes") {
    val full = Seq((1L, 5.0, 150.0)).toDF("node", "bus_voltage", "current_mA")
    val reduced = Seq(Tuple1(2L)).toDF("node")
    val merged = full.unionByName(reduced, allowMissingColumns = true)
      .orderBy("node").collect()
    assert(merged.length == 2)
    assert(merged(1).getAs[Any]("bus_voltage") == null)
  }
}
