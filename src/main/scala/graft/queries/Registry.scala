package graft.queries

/** All declared queries, one place. Modules register themselves here. */
object Registry {
  def all: Seq[QueryDef] =
    RelationalQueries.all ++ EventQueries.all ++ CheckQueries.all ++
      TextQueries.all ++ VectorQueries.all ++ ExtraQueries.all ++
      ReshapeQueries.all ++ SamplingQueries.all ++
      SubqueryQueries.all ++ CorpusQueries.all ++ TpchShapes.all ++
      RetrievalQueries.all ++
      BreadthQueries.all ++ ScaleQueries.all ++ StagingQueries.all ++
      AnalyticsQueries.all
}
