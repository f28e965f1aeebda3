package graft.queries

import graft.core.Q

object ScalarQueries {
  val all: Seq[Q] = Seq()
}
