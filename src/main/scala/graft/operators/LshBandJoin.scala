package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The LSH candidate-pair primitive shared by every bucketed near-dup /
  * ANN path (MinHash bands over shingles, hyperplane bands over
  * embeddings): self-join a (id, band_key) table on the band key, keep
  * ordered pairs, dedup. The band key is the ONLY shuffle key over the
  * big side, so work distributes by bucket at any scale; bucket size is
  * controlled upstream by bands × bits/rows per band.
  */
object LshBandJoin {

  /** @param bands (id, band_key) rows, one per item per band
    * @param idCol name of the id column in `bands`
    * @return distinct (<idCol>_a, <idCol>_b) candidate pairs with a < b
    */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val (a, b) = (s"${idCol}_a", s"${idCol}_b")
    bands.select(col(idCol).as(a), col("band_key"))
      .join(bands.select(col(idCol).as(b), col("band_key").as("bk_r")),
        col("band_key") === col("bk_r") && col(a) < col(b))
      .select(col(a), col(b)).distinct()
  }
}
