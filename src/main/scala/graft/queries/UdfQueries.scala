package graft.queries

import graft.core.Q

object UdfQueries {
  val all: Seq[Q] = Seq()
}
