package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries.{AudioQueries, BitextQueries, BloomQueries, DimReductionQueries, DpQueries, EnrichmentQueries, ExtensionQueries, GraphAnnQueries, ImageQueries, IngestQueries, ParityQueries, PipelineQuery, QueryDef, RerankQueries, SecurityQueries, TemplateQueries, UnigramQueries, UnimaxQueries, UrlQueries, VideoQueries, WordPieceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private[graft] def allDefs: Seq[QueryDef] = {
    val defs =
      ParityQueries.all ++ ExtensionQueries.all ++ EnrichmentQueries.all ++
        PipelineQuery.all ++ UrlQueries.all ++ DimReductionQueries.all ++
        ImageQueries.all ++ UnigramQueries.all ++ WordPieceQueries.all ++
        UnimaxQueries.all ++ BloomQueries.all ++ AudioQueries.all ++
        BitextQueries.all ++ SecurityQueries.all ++ VideoQueries.all ++
        TemplateQueries.all ++ DpQueries.all ++ GraphAnnQueries.all ++
        RerankQueries.all ++ IngestQueries.all
    // A duplicate name would silently shadow a query when `.toMap` keeps
    // the last entry, shrinking the correctness gate without any failure.
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dups.isEmpty, s"duplicate query names: ${dups.mkString(", ")}")
    defs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.q1Agg.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
