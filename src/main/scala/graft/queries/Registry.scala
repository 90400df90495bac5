package graft.queries

import graft.QSpec

/** All oracle-checkable queries the engine exposes, keyed uniquely. */
object Registry {
  val all: Seq[QSpec] = {
    val qs = Relational.all ++ TrainingData.all ++ MultimodalQueries.all ++
      WebQueries.all ++ OtlpReaders.all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }
}
