package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model for perplexity filtering — the
  * CCNet/RefinedWeb "KenLM perplexity" quality signal, with the n-gram
  * model trained ON the corpus itself by two aggregations instead of an
  * external model file: P(w2|w1) = (count(w1 w2) + α) / (count(w1) + α·V)
  * (add-α smoothing over the observed vocabulary V), and each document
  * scored by its mean bigram log-probability and perplexity
  * exp(−mean log P).
  *
  * Scale shape: training is two hash aggregations (unigram and bigram
  * counts) with map-side partials; scoring pre-aggregates each document's
  * bigram MULTIPLICITIES (one row per distinct bigram per doc, weighted by
  * its count) before joining the count tables, so the model join moves
  * distinct-bigram rows, not every token position. V is one driver-side
  * scalar. Everything is key-partitioned joins and aggs — no broadcast of
  * the model needed, no global order, no driver loop over data.
  */
object LangModel {
  def bigramPerplexity(docs: DataFrame, textCol: String, idCol: String,
                       alpha: Double = 0.5): DataFrame = {
    val rawToks = split(lower(trim(col(textCol))), "\\s+")
    val toksCol = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>")).otherwise(rawToks)
    val base = docs.select(col(idCol), toksCol.as("t"))

    val uni = base.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val vocab = uni.count() // V: one driver scalar (model metadata)

    val bigrams = base.select(col(idCol),
        explode(when(size(col("t")) < 2, array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    val bic = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    // per-doc distinct bigrams with multiplicity — the model join moves
    // one row per distinct (doc, bigram), not per token position
    val perDoc = bigrams.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))

    val scored = perDoc
      .join(bic, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .withColumn("__lp",
        col("k") * log((col("bc") + alpha) / (col("uc") + alpha * vocab)))
      .groupBy(idCol)
      .agg(sum(col("k")).as("n_bigrams"), sum(col("__lp")).as("__slp"))

    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        round(when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("__slp") / col("n_bigrams")), 6).as("avg_logprob"),
        round(when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(exp(-(col("__slp") / col("n_bigrams")))), 4).as("ppl"))
  }
}
