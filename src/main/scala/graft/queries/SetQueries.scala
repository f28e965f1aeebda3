package graft.queries

import graft.core.Q

object SetQueries {
  val all: Seq[Q] = Seq()
}
