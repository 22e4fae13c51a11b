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
  private def tokenized(docs: DataFrame, textCol: String, idCol: String) = {
    val rawToks = split(lower(trim(col(textCol))), "\\s+")
    val toksCol = when(length(trim(col(textCol))) === 0,
      array().cast("array<string>")).otherwise(rawToks)
    docs.select(col(idCol), toksCol.as("t"))
  }

  private def bigramsOf(base: DataFrame, idCol: String) =
    base.select(col(idCol),
        explode(when(size(col("t")) < 2, array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(transform(sequence(lit(1), size(col("t")) - 1),
            i => struct(element_at(col("t"), i).as("w1"),
              element_at(col("t"), i + 1).as("w2"))))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Per-document avg bigram log-probability under a model trained on
    * `modelDocs` (defaults to the scored corpus). Bigrams/contexts the
    * model never saw fall back to the smoothed floor via LEFT joins and
    * zero counts — required for cross-model scoring (DSIR).
    */
  def bigramPerplexity(docs: DataFrame, textCol: String, idCol: String,
                       alpha: Double = 0.5,
                       modelDocs: Option[DataFrame] = None): DataFrame = {
    val base = tokenized(docs, textCol, idCol)
    val modelBase = modelDocs.map(tokenized(_, textCol, idCol)).getOrElse(base)

    val uni = modelBase.select(explode(col("t")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("uc"))
    val vocab = uni.count() // V: one driver scalar (model metadata)

    val bic = bigramsOf(modelBase, idCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("bc"))
    // per-doc distinct bigrams with multiplicity — the model join moves
    // one row per distinct (doc, bigram), not per token position
    val perDoc = bigramsOf(base, idCol)
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))

    val scored = perDoc
      .join(bic, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .withColumn("__lp",
        col("k") * log((coalesce(col("bc"), lit(0L)) + alpha)
          / (coalesce(col("uc"), lit(0L)) + alpha * vocab)))
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

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): each document's
    * log-importance-weight is its avg bigram log-probability under a
    * TARGET-domain model minus under the general-corpus model; documents
    * with non-negative log-weight look at least as target-like as
    * corpus-like. Threshold selection keeps the operator free of any
    * global order (at scale a quantile cut uses approx_percentile +
    * broadcast, not a global sort).
    */
  def importanceWeights(docs: DataFrame, target: DataFrame,
                        textCol: String, idCol: String,
                        alpha: Double = 0.5): DataFrame = {
    val lpT = bigramPerplexity(docs, textCol, idCol, alpha, Some(target))
      .select(col(idCol), col("n_bigrams"),
        col("avg_logprob").as("lp_target"))
    val lpC = bigramPerplexity(docs, textCol, idCol, alpha)
      .select(col(idCol), col("avg_logprob").as("lp_corpus"))
    lpT.join(lpC, Seq(idCol))
      .withColumn("log_weight", round(col("lp_target") - col("lp_corpus"), 6))
      .withColumn("selected", col("log_weight") >= 0)
  }
}
