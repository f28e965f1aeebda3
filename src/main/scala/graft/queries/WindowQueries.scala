package graft.queries

import graft.core.Q

object WindowQueries {
  val all: Seq[Q] = Seq()
}
