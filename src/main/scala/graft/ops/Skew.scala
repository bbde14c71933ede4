package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-mitigation operators (the 100 TB concern behind SURVEY.md §4's
  * partitioning notes): salting spreads a hot key across `salts` synthetic
  * sub-keys so no single task owns the whole key.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the two shapes AQE doesn't: hash aggregation on a hot key and
  * broadcast-side replication.
  */
object Skew {

  /** Two-level salted aggregation: (key, salt) partial -> key final.
    * Results are identical to a plain groupBy (sums accumulate in exact
    * decimal), which is exactly what the oracle checks. */
  def saltedGroupSum(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol).cast(DecimalType(28, 6))).as("_partial"),
        count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast(DoubleType).as("sum_value"),
        sum(col("_n")).as("n"))

  /** Salted broadcast-replication join for a skewed fact key: the fact side
    * gets a random-ish salt in [0, salts); the (small) dimension side is
    * replicated once per salt value, so the join key (key, salt) spreads a
    * hot key over `salts` tasks. Result equals the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt", pmod(spark_partition_id(), lit(salts)))
    val replicatedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "_salt"), "left_outer").drop("_salt")
  }
}
