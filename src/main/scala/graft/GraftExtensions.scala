package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions._

/** SQL-surface registration for the custom kernels: installing this
  * class via `spark.sql.extensions=graft.GraftExtensions` (wired into
  * [[GraftSession]] by default) makes every kernel callable from plain
  * SQL — `SELECT simhash64(text) FROM docs` — so SQL-only consumers
  * (notebooks, JDBC gateways, dbt-style models) get the same
  * analysis-time-checked expressions the DataFrame DSL uses, not a
  * slower UDF re-implementation. Scalar config arguments (hash counts,
  * band shapes) must be literals and are validated at REGISTRATION
  * call time with a descriptive error, consistent with the repo's
  * refuse-early style. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case lit if lit.foldable && lit.dataType ==
        org.apache.spark.sql.types.IntegerType =>
      lit.eval().asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case lit if lit.foldable && (lit.dataType ==
        org.apache.spark.sql.types.LongType || lit.dataType ==
        org.apache.spark.sql.types.IntegerType) =>
      lit.eval() match { case i: Int => i.toLong; case l: Long => l }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got ${other.sql}")
  }

  private def doubleLit(e: Expression, fn: String, arg: String): Double = e match {
    case lit if lit.foldable && (lit.dataType ==
        org.apache.spark.sql.types.DoubleType || lit.dataType ==
        org.apache.spark.sql.types.IntegerType) =>
      lit.eval() match { case i: Int => i.toDouble; case d: Double => d }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got ${other.sql}")
  }

  private def nArgs(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(text, numHashes, shingleSize) - MinHash signature array"),
      (args: Seq[Expression]) => {
        nArgs("minhash_sig", args, 3)
        MinHashSigExpr(args.head,
          intLit(args(1), "minhash_sig", "numHashes"),
          intLit(args(2), "minhash_sig", "shingleSize"))
      }))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit SimHash over tokens"),
      (args: Seq[Expression]) => {
        nArgs("simhash64", args, 1)
        SimHash64Expr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("deflate_ratio"),
      info("deflate_ratio",
        "deflate_ratio(text) - deflate compressibility signal: compressed/raw UTF-8 bytes (level 6, raw stream)"),
      (args: Seq[Expression]) => {
        nArgs("deflate_ratio", args, 1)
        DeflateRatioExpr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of numeric arrays"),
      (args: Seq[Expression]) => {
        nArgs("cosine_sim", args, 2)
        CosineSimExpr(args.head, args(1))
      }))
    ext.injectFunction((FunctionIdentifier("cosine_lsh_bands"),
      info("cosine_lsh_bands", "cosine_lsh_bands(vec, bands, bitsPerBand, seed) - hyperplane LSH band keys"),
      (args: Seq[Expression]) => {
        nArgs("cosine_lsh_bands", args, 4)
        CosineLshBandsExpr(args.head,
          intLit(args(1), "cosine_lsh_bands", "bands"),
          intLit(args(2), "cosine_lsh_bands", "bitsPerBand"),
          longLit(args(3), "cosine_lsh_bands", "seed"))
      }))
    ext.injectFunction((FunctionIdentifier("word_ngram_hashes"),
      info("word_ngram_hashes", "word_ngram_hashes(tokens, n) - rolling 64-bit window hashes"),
      (args: Seq[Expression]) => {
        nArgs("word_ngram_hashes", args, 2)
        WordNgramHashExpr(args.head, intLit(args(1), "word_ngram_hashes", "n"))
      }))
    ext.injectFunction((FunctionIdentifier("char_ngram_hashes"),
      info("char_ngram_hashes", "char_ngram_hashes(text, n) - rolling 64-bit hashes of every n-char window"),
      (args: Seq[Expression]) => {
        nArgs("char_ngram_hashes", args, 2)
        CharNgramHashExpr(args.head, intLit(args(1), "char_ngram_hashes", "n"))
      }))
    ext.injectFunction((FunctionIdentifier("cut_spans"),
      info("cut_spans", "cut_spans(text, starts, n) - remove merged n-char spans; returns struct(clean_text, dup_spans, removed_chars)"),
      (args: Seq[Expression]) => {
        nArgs("cut_spans", args, 3)
        CutSpansExpr(args.head, args(1), intLit(args(2), "cut_spans", "n"))
      }))
    ext.injectFunction((FunctionIdentifier("repetition_stats"),
      info("repetition_stats", "repetition_stats(normText) - word/bigram repetition counters"),
      (args: Seq[Expression]) => {
        nArgs("repetition_stats", args, 1)
        RepetitionStatsExpr(args.head)
      }))
    ext.injectFunction((FunctionIdentifier("cosine_bucket_dups"),
      info("cosine_bucket_dups", "cosine_bucket_dups(bucket, threshold, roundDigits) - in-bucket cosine dup ids"),
      (args: Seq[Expression]) => {
        nArgs("cosine_bucket_dups", args, 3)
        CosineBucketDupsExpr(args.head,
          doubleLit(args(1), "cosine_bucket_dups", "threshold"),
          intLit(args(2), "cosine_bucket_dups", "roundDigits"))
      }))
    // a composed codegen'd regexp chain, not a single kernel: the
    // builder folds TextFunctions.stripHtmlSteps (the ONE definition
    // the DataFrame verb uses) into raw RegExpReplace nodes — Column
    // compositions can't pass through injectFunction directly, and a
    // second hand-written chain here could drift from the verb
    ext.injectFunction((FunctionIdentifier("strip_html"),
      info("strip_html", "strip_html(html) - HTML to plain text: script/style/comment bodies removed, tags to spaces, named entities decoded, whitespace collapsed"),
      (args: Seq[Expression]) => {
        nArgs("strip_html", args, 1)
        import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace, StringTrim}
        StringTrim(graft.text.TextFunctions.stripHtmlSteps.foldLeft(args.head) {
          case (e, (pat, rep)) => RegExpReplace(e, Literal(pat), Literal(rep))
        })
      }))
  }
}
