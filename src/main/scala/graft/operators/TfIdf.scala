package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** TF-IDF keyword extraction over a document corpus — the classic
  * feature/metadata-extraction step of a training-data pipeline
  * (SURVEY.md §2.12 "text analysis"; no reference analogue).
  *
  * Scale shape: one shuffle to (doc, token) term frequencies; the
  * document-frequency table is vocabulary-sized (≪ corpus) and is
  * broadcast into the scoring join together with the one-row corpus
  * count, so the per-token scoring never reshuffles; ranking is a
  * window partitioned BY DOCUMENT — thousands of parallel partitions,
  * never a global sort.
  */
object TfIdf {

  /** Top-k terms per document by tf·idf with idf = round(ln(N/df), 4).
    * The rounding is deliberate: ln differs in the last ulp across
    * libm implementations, while tf/df/N are exact integers — rounding
    * the only transcendental makes the score reproducible bit-for-bit
    * on any engine (the [[graft.analytics.Exact]] parity discipline).
    *
    * Returns (doc_id, term_rank, token, tf, score), k rows per doc,
    * ties broken lexicographically. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(Text.words(col(textCol))).as("token"))
    val tf = toks.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfTbl = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(broadcast(dfTbl), Seq("token"))
      .crossJoin(broadcast(n))
      .withColumn("idf", round(log(col("n_docs") / col("df")), 4))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col("doc_id"), col("term_rank"), col("token"), col("tf"),
        col("score"))
  }
}
