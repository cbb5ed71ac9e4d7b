package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: the classic remedy when one join
  * key carries a disproportionate share of rows and a single shuffle
  * partition becomes the straggler (AQE's skew-join split handles
  * sort-merge cases at runtime; salting is the declarative form that
  * also works for aggregations feeding the join).
  *
  * The big (skewed) side gets a deterministic per-row salt in [0, n);
  * the small side is exploded n× so every (key, salt) pair finds its
  * match. The join result is EXACTLY the plain join's — verified by the
  * oracle on q_join_salted_skew, whose DuckDB mirror is the unsalted
  * join.
  */
object SkewJoin {

  /** Left-side salted inner equi-join on `bigKey === smallKey`.
    *
    * @param saltSrc deterministic per-row expression on `big` used to
    *                derive the salt (any well-distributed column; a
    *                row-unique id is ideal)
    */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
                      bigKey: Column, smallKey: Column,
                      saltSrc: Column, salts: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(saltSrc, lit(salts)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded,
      bigKey === smallKey && salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }
}
