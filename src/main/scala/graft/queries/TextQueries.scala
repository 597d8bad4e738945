package graft.queries
object TextQueries { val all: Seq[GQuery] = Seq() }
