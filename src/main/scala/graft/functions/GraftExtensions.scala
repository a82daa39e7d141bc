package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the engine's native expressions and
  * composed column functions, so `spark.sql("SELECT float_vector_cosine(a,
  * b) ...")` works alongside the Column API.
  *
  * Two registration paths:
  *  - `GraftExtensions` for
  *    `SparkSession.builder().withExtensions(new GraftExtensions)` or
  *    `spark.sql.extensions=graft.functions.GraftExtensions` config;
  *  - `GraftFunctions.register(spark)` for an already-built session.
  *
  * Besides the native expressions, several pure-Column operators register
  * as MACRO functions: the builder expands them into the same Catalyst
  * expression tree the Column API builds, so the SQL surface and the Scala
  * surface cannot diverge (one definition, two syntaxes).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(e.injectFunction)
    // whole-operator extension: AsOfJoinPlan -> AsOfJoinExec
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  private def descriptor(
      name: String, clazz: Class[_], usage: String)(
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, null, name, usage, ""),
      builder)

  private def arity(name: String, exprs: Seq[Expression], n: Int): Unit =
    require(exprs.length == n, s"$name expects $n arguments, got ${exprs.length}")

  /** A column-function macro: the SQL arguments feed the SAME Column
    * composition the Scala API uses, and the resulting expression tree is
    * returned for Catalyst to analyze in place.
    */
  private def macroFn(
      name: String, usage: String)(
      f: Seq[org.apache.spark.sql.Column] => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptor(name, classOf[GraftExtensions], usage) { exprs =>
      Bridge.resolvedExpression(f(exprs.map(Bridge.column)))
    }

  /** Evaluate a foldable integer argument at registration time (literal
    * parameters like winnowing's k/w must be plan constants).
    */
  private def litInt(name: String, arg: String, e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$name: $arg must be an integer literal")
    e.eval().asInstanceOf[Int]
  }


  private[functions] val floatVectorCosineDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    descriptor("float_vector_cosine", classOf[FloatVectorCosine],
      "_FUNC_(a, b) - cosine similarity of two array<float> vectors") { exprs =>
      arity("float_vector_cosine", exprs, 2)
      FloatVectorCosine(exprs.head, exprs(1))
    }

  private val floatVectorDotDescriptor =
    descriptor("float_vector_dot", classOf[FloatVectorDot],
      "_FUNC_(a, b) - dot product of two array<float> vectors") { exprs =>
      arity("float_vector_dot", exprs, 2)
      FloatVectorDot(exprs.head, exprs(1))
    }

  private val winnowDescriptor =
    descriptor("graft_winnow_fingerprints", classOf[WinnowFingerprints],
      "_FUNC_(text[, k, w]) - winnowed k-gram fingerprint array") { exprs =>
      exprs match {
        case Seq(t) => WinnowFingerprints(t, 8, 4)
        case Seq(t, k, w) => WinnowFingerprints(t,
          litInt("graft_winnow_fingerprints", "k", k),
          litInt("graft_winnow_fingerprints", "w", w))
        case _ => throw new IllegalArgumentException(
          s"graft_winnow_fingerprints expects 1 or 3 arguments, got ${exprs.length}")
      }
    }

  private val macroDescriptors = Seq(
    macroFn("graft_simhash64",
      "_FUNC_(text) - 64-bit SimHash fingerprint over word tokens") { args =>
      require(args.length == 1, "graft_simhash64 expects 1 argument")
      graft.ext.Dedup.simhash64(args.head)
    },
    macroFn("graft_lang_id",
      "_FUNC_(text) - marker-token language id (en/es/de/und). CHEAP " +
        "SCREEN only: the primary language identifier is the trained " +
        "char-trigram Naive Bayes scorer (graft.ext.LangId.train/score, " +
        "q_lang_id_ngram) - a model artifact, not a scalar, so it has " +
        "no macro form; use this one for triage, the NB scorer for " +
        "corpus decisions") { args =>
      require(args.length == 1, "graft_lang_id expects 1 argument")
      graft.ext.TextAnalysis.languageId(args.head)
    },
    macroFn("graft_banned_count",
      "_FUNC_(text, terms_csv) - whole-word occurrences of any " +
        "comma-separated blocklist term (the C4/UT1 screen's scoring " +
        "column; terms restricted to [A-Za-z0-9_-]+)") { args =>
      require(args.length == 2, "graft_banned_count expects 2 arguments")
      graft.ext.TextAnalysis.bannedCount(args.head,
        Bridge.foldableString("graft_banned_count", "terms_csv", args(1))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    },
    macroFn("graft_ccnet_bucket",
      "_FUNC_(scoreq, cutoffs_csv, fallback) - frozen-cutoff CCNet " +
        "bucket of an integer LM score: first label:minscore pair " +
        "(best-first, e.g. 'head:1200,middle:400') whose cutoff the " +
        "score meets, else the fallback label - the ingest-edge twin " +
        "of graft.ext.Relevance.perplexityBuckets (the corpus-quantile " +
        "batch operator; its cutoffs come from Relevance.bucketCutoffs)") { args =>
      require(args.length == 3, "graft_ccnet_bucket expects 3 arguments")
      val cutoffs = Bridge
        .foldableString("graft_ccnet_bucket", "cutoffs_csv", args(1))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map { kv =>
          val Array(label, cut) = kv.split(":", 2)
          require(cut.matches("-?[0-9]+"),
            s"graft_ccnet_bucket: cutoff for '$label' must be an integer, got '$cut'")
          (label, cut.toLong)
        }
      val fallback = Bridge
        .foldableString("graft_ccnet_bucket", "fallback", args(2))
      graft.ext.Relevance.bucketExpr(args.head, cutoffs, fallback)
    },
    macroFn("graft_doc_fingerprint",
      "_FUNC_(text) - md5 of case/whitespace-normalized text") { args =>
      require(args.length == 1, "graft_doc_fingerprint expects 1 argument")
      graft.ext.TextAnalysis.fingerprint(args.head)
    },
    macroFn("graft_dup_token_frac",
      "_FUNC_(text) - fraction of tokens that are repeat occurrences") { args =>
      require(args.length == 1, "graft_dup_token_frac expects 1 argument")
      graft.ext.TextAnalysis.dupTokenFrac(args.head)
    },
    macroFn("graft_url_canonicalize",
      "_FUNC_(url) - canonical URL: fragment/tracking-param strip, " +
        "scheme+host lowercase, default-port drop, param sort, slash trim") { args =>
      require(args.length == 1, "graft_url_canonicalize expects 1 argument")
      graft.ext.UrlOps.canonicalizeUrl(args.head)
    },
    macroFn("graft_url_host",
      "_FUNC_(url) - lowercased host of an absolute URL") { args =>
      require(args.length == 1, "graft_url_host expects 1 argument")
      graft.ext.UrlOps.urlHost(args.head)
    },
    macroFn("graft_registered_domain",
      "_FUNC_(host) - registered (pay-level) domain of a lowercase host") { args =>
      require(args.length == 1, "graft_registered_domain expects 1 argument")
      graft.ext.UrlOps.registeredDomain(args.head)
    },
    descriptor("graft_dup_ngram_frac", classOf[DupNgramFrac],
      "_FUNC_(text, n) - fraction of word n-grams that are repeats") { exprs =>
      arity("graft_dup_ngram_frac", exprs, 2)
      DupNgramFrac(exprs.head, litInt("graft_dup_ngram_frac", "n", exprs(1)))
    })

  private val nfcNormalizeDescriptor =
    descriptor("nfc_normalize", classOf[NfcNormalize],
      "_FUNC_(s) - Unicode NFC canonical composition of a string") { exprs =>
      arity("nfc_normalize", exprs, 1)
      NfcNormalize(exprs.head)
    }

  private val zorderDescriptor =
    descriptor("graft_zorder16", classOf[ZOrder16],
      "_FUNC_(a, b) - 2-D Z-order (Morton) clustering key over the low 16 bits of each") { exprs =>
      arity("graft_zorder16", exprs, 2)
      ZOrder16(
        org.apache.spark.sql.catalyst.expressions.Cast(exprs.head,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(exprs(1),
          org.apache.spark.sql.types.LongType))
    }

  private val charEntropyDescriptor =
    descriptor("graft_char_entropy", classOf[CharEntropyQ],
      "_FUNC_(text, maxChars) - fixed-point (bits x 2^20) character-class " +
        "entropy of the first maxChars code points") { exprs =>
      arity("graft_char_entropy", exprs, 2)
      CharEntropyQ(exprs.head, litInt("graft_char_entropy", "maxChars", exprs(1)))
    }

  private[functions] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    floatVectorCosineDescriptor +: floatVectorDotDescriptor +:
      winnowDescriptor +: nfcNormalizeDescriptor +: zorderDescriptor +:
      charEntropyDescriptor +: macroDescriptors

  /** Register the engine's SQL functions on an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
