package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-adaptive language-model quality scoring: per-document
  * cross-entropy under an add-one-smoothed unigram model of a
  * reference corpus — the CCNet-style filter ("how surprising is this
  * document under in-domain statistics"), one notch above the static
  * heuristics in [[TextFunctions]]. (Extension beyond the reference
  * surface.)
  *
  * Model: p(t) = (count(t) + 1) / (total + V) over the training
  * corpus (V = vocabulary size; unseen tokens get 1 / (total + V)).
  * Per-token surprisals −ln p(t) quantize to integer micro-units, so
  * each document's surprisal SUM is an order-independent long and the
  * mean (`xent = sum / 1e6 / n`) is bit-reproducible cross-engine —
  * same contract as the BM25 / tf-idf scores.
  *
  * Scale shape: the vocabulary aggregates once (map-side partials,
  * vocabulary ≪ corpus); totals are one broadcast row; scoring joins
  * the exploded corpus to the vocabulary on the term key (AQE
  * broadcasts when it fits) and reduces per document. Gram-less
  * documents survive with n_tokens = 0, xent = 0.
  */
object LangModel {

  private def toks(text: org.apache.spark.sql.Column) =
    TextFunctions.wsTokens(text)

  /** Bigram upgrade of [[unigramXent]]: per-document mean conditional
    * surprisal −ln p(w_i | w_{i−1}) under add-one-smoothed bigram
    * statistics of the training corpus — the textbook Laplace bigram:
    *   p(b | a) = (count(a b) + 1) / (count(a) + V)
    * where count(a) is a's UNIGRAM count (it differs from the count
    * of bigrams starting with a only for document-final tokens, and
    * keeps the denominator derivable from the unigram table alone);
    * V = unigram vocabulary size, so an unseen context scores
    * 1 / V. Documents with < 2 tokens score 0 over 0 transitions.
    * Same micro-unit exactness contract and the same scale shape —
    * one extra vocabulary-sized aggregation (bigrams) and the scoring
    * join runs on an 8-byte xxhash64 of the pair, so no pair STRINGS
    * reach a shuffle. Returns
    * (doc_id, n_transitions, surprisal_micro, xent). */
  def bigramXent(docs: DataFrame, idCol: String, textCol: String,
                 train: DataFrame, trainTextCol: String): DataFrame = {
    // explode_outer + post-filter, NOT plain explode: explode makes
    // Catalyst infer a `size(arr) > 0` filter whose pushdown DUPLICATES
    // the whole tokenize/transform expression below the projection —
    // measured 2-10x on these train-side scans (explode_outer infers
    // nothing; the post-filter runs on the materialized attribute)
    val trainToks = train.select(toks(col(trainTextCol)).as("__toks"))
    val uni = trainToks.select(explode_outer(col("__toks")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term")).agg(count(lit(1)).as("__ctx"))
    val totals = uni.agg(count(lit(1)).as("__v"))
      .select(when(col("__v") > 0, col("__v"))
        .otherwise(raise_error(lit(
          "bigramXent: training corpus has no tokens — no model to score under")))
        .as("__v"))
    // NB sequence(0, n) with n < 0 DESCENDS ([0, -1]) — guard short
    // rows. Pairs hash IN the lambda (xxhash64 over both words) — no
    // pair string is ever materialized or shuffled.
    val bi = trainToks
      .select(when(size(col("__toks")) >= 2,
        transform(
          sequence(lit(0), size(col("__toks")) - lit(2)),
          i => xxhash64(
            element_at(col("__toks"), i + lit(1)),
            element_at(col("__toks"), i + lit(2))))).as("__phs"))
      .select(explode_outer(col("__phs")).as("__ph"))
      .filter(col("__ph").isNotNull)
      .groupBy(col("__ph")).agg(count(lit(1)).as("__cnt"))

    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"),
        toks(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col("doc_id"),
        greatest(size(col("__toks")).cast("long") - lit(1L), lit(0L))
          .as("n_transitions"),
        explode_outer(when(size(col("__toks")) >= 2,
          transform(
            sequence(lit(0), size(col("__toks")) - lit(2)),
            i => struct(
              element_at(col("__toks"), i + lit(1)).as("w1"),
              xxhash64(
                element_at(col("__toks"), i + lit(1)),
                element_at(col("__toks"), i + lit(2))).as("ph")))))
          .as("__t"))
      .select(col("doc_id"), col("n_transitions"),
        col("__t.w1").as("term"),
        col("__t.ph").as("__ph"))

    grams
      .join(uni.withColumnRenamed("term", "__uterm"),
        col("term") === col("__uterm"), "left")
      .join(bi, Seq("__ph"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_transitions"),
        when(col("term").isNotNull,
          round(lit(-1e6) *
            log((coalesce(col("__cnt"), lit(0L)) + lit(1.0)) /
              (coalesce(col("__ctx"), lit(0L)) + col("__v"))), 0).cast("long"))
          .otherwise(lit(0L)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_transitions")).as("n_transitions"),
        sum(col("__c")).as("surprisal_micro"))
      .select(col("doc_id"), col("n_transitions"), col("surprisal_micro"),
        when(col("n_transitions") > 0,
          col("surprisal_micro").cast("double") / lit(1e6) /
            col("n_transitions").cast("double"))
          .otherwise(lit(0.0)).as("xent"))
  }

  /** Score `docs` under a unigram model trained on `train` (pass the
    * same frame to self-score). Returns
    * (doc_id, n_tokens, surprisal_micro, xent) with xent in nats. */
  def unigramXent(docs: DataFrame, idCol: String, textCol: String,
                  train: DataFrame, trainTextCol: String): DataFrame = {
    // explode_outer + post-filter: see bigramXent — plain explode's
    // inferred size-filter would re-tokenize the train corpus twice
    val vocab = train
      .select(toks(col(trainTextCol)).as("__toks"))
      .select(explode_outer(col("__toks")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
    // an empty/token-less training corpus has no model to score under —
    // raise a descriptive error at evaluation instead of propagating
    // nulls into every score (sum over zero rows is null)
    val totals = vocab.agg(
      coalesce(sum(col("__cnt")), lit(0L)).as("__total"),
      count(lit(1)).as("__v"))
      .select(
        when(col("__v") > 0, col("__total"))
          .otherwise(raise_error(lit(
            "unigramXent: training corpus has no tokens — no model to score under")))
          .as("__total"),
        col("__v"))

    // null text scores like empty text (0 tokens), not Spark's
    // size(null) = -1 legacy sentinel
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"),
        toks(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("n_tokens"),
        explode_outer(col("__toks")).as("term"))

    grams
      .join(vocab, Seq("term"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("n_tokens"),
        when(col("term").isNotNull,
          round(lit(-1e6) *
            log((coalesce(col("__cnt"), lit(0L)) + lit(1.0)) /
              (col("__total") + col("__v"))), 0).cast("long"))
          .otherwise(lit(0L)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(first(col("n_tokens")).as("n_tokens"),
        sum(col("__c")).as("surprisal_micro"))
      .select(col("doc_id"), col("n_tokens"), col("surprisal_micro"),
        when(col("n_tokens") > 0,
          col("surprisal_micro").cast("double") / lit(1e6) / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)).as("xent"))
  }
}
