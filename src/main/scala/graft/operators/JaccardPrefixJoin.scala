package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PPJoin-style LOSSLESS prefix-filtered Jaccard self-join over a
  * (doc_id, s) shingle table: a pair with J >= t must share a shingle
  * inside each doc's first n - ceil(t·n) + 1 shingles under a global
  * order, so candidate enumeration touches ~(1-t) of the index instead
  * of every co-occurring shingle — the fix for the naive join's
  * worst-case quadratic blowup on hot shingles.
  *
  * Cost shape: one extra sort (per-doc shingle ranking) + two candidate
  * joins. At small data the naive co-shingle join wins on constants
  * (see TextQueries.q_dedup_ngram_jaccard, which stays naive as the
  * oracle-checked baseline — MinHash-LSH is the primary scale path);
  * this operator is for corpora where shingle hot spots make the naive
  * join explode. JaccardPrefixSpec proves output equality.
  */
object JaccardPrefixJoin {

  /** ceil(t·n) for t = num/den in pure integer arithmetic. */
  private def ceilFrac(n: Column, num: Int, den: Int): Column =
    expr(s"(n*$num + ${den - 1}) DIV $den")

  /** @param sh        distinct (doc_id, s) shingle table
    * @param orderHash global shingle order (any deterministic hash col fn)
    * @param num/den   threshold t as a fraction (e.g. 4/5 for 0.8)
    */
  def similarPairs(sh: DataFrame, orderHash: Column => Column,
                   num: Int, den: Int): DataFrame = {
    val t = num.toDouble / den
    val cached = sh.persist()
    val sizes = cached.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(orderHash(col("s")), col("s"))
    val prefixes = cached.join(sizes, "doc_id")
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= col("n") - ceilFrac(col("n"), num, den) + 1)
      .select(col("doc_id"), col("s"))
    val cand = prefixes.select(col("doc_id").as("doc_a"), col("s"))
      .join(prefixes.select(col("doc_id").as("doc_b"), col("s").as("s_r")),
        col("s") === col("s_r") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val shB = cached.select(col("doc_id").as("doc_b2"), col("s").as("s_b"))
    val inter = cand
      .join(cached.select(col("doc_id").as("doc_a"), col("s")), "doc_a")
      .join(shB, col("doc_b") === col("doc_b2") && col("s") === col("s_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast(DoubleType)
          / (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
      .where(col("jaccard") >= t)
  }
}
