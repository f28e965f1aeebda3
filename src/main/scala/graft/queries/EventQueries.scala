package graft.queries

import graft.core.Q

object EventQueries {
  val all: Seq[Q] = Seq()
}
