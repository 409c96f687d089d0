package graft

import graft.operators._

/** Central inventory: one QuerySpec per operator declared in
  * SURVEY.md §2 ("THE CONTRACT"). Append-only across rounds.
  */
object Registry {
  def specs: Seq[QuerySpec] =
    Core.specs ++ Aggregates.specs ++ SetOps.specs ++ Joins.specs ++
      Windows.specs ++ TimeWindows.specs ++ TextOps.specs ++
      VectorOps.specs ++ MiscOps.specs ++ PipelineOps.specs ++
      SurveyOps.specs ++ MediaOps.specs ++ CurationOps.specs ++
      GraphOps.specs ++ EventOps.specs

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame] =
    specs.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
