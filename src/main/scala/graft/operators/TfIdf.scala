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

  /** BM25 retrieval scoring: rank documents against a bag of query
    * `terms` with the classic Okapi formula — per term,
    * idf·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), idf =
    * ln(1 + (N−df+0.5)/(df+0.5)). The score is emitted as integer
    * e4 fixed-point (`score_e4`) and the only transcendental (ln) is
    * rounded to 4 decimals first — the [[topTerms]] /
    * [[graft.analytics.Exact]] cross-engine parity discipline.
    *
    * Returns the top `k` documents as (doc_id, dl, score_e4), ordered
    * by score descending then doc_id.
    *
    * Scale shape: TWO corpus passes over a two-column projection and
    * nothing else — pass 1 reduces to ONE stats row (N, Σdl, and one
    * df per query term; map-side combined), which is broadcast into
    * pass 2's per-row scoring; dl/avgdl is computed as dl·N/Σdl so
    * everything before the one division stays exact integer. The
    * global top-k plans as TakeOrderedAndProject — no global sort, no
    * shuffle of the corpus at any point.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           k: Int = 25): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val tfCols = terms.indices.map(i => s"__tf$i")
    val base = docs
      .select(col(idCol).as("doc_id"), Text.words(col(textCol)).as("__w"))
      .select(col("doc_id") +: size(col("__w")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("__w"), x => x === lit(t))).cast("long")
            .as(tfCols(i))
        }: _*)
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("dl")).as("__sumdl") +: terms.indices.map(i =>
        sum((col(tfCols(i)) > 0).cast("long")).as(s"__df$i")): _*)
    val score = terms.indices.map { i =>
      val tf = col(tfCols(i)).cast("double")
      val df = col(s"__df$i").cast("double")
      val idf = round(log(
        (col("__n").cast("double") - df + lit(0.5)) / (df + lit(0.5))
          + lit(1.0)), 4)
      val norm = lit(k1) * (lit(1.0 - b) + lit(b) *
        (col("dl") * col("__n")).cast("double") /
        col("__sumdl").cast("double"))
      idf * (tf * lit(k1 + 1.0)) / (tf + norm)
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .withColumn("score_e4", round(score * lit(1e4)).cast("long"))
      .select(col("doc_id"), col("dl"), col("score_e4"))
      .orderBy(col("score_e4").desc, col("doc_id"))
      .limit(k)
  }
}
