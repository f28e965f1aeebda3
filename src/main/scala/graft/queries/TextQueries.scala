package graft.queries

import graft.core.Q

object TextQueries {
  val all: Seq[Q] = Seq()
}
