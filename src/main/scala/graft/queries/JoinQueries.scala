package graft.queries

import graft.core.Q

object JoinQueries {
  val all: Seq[Q] = Seq()
}
