package graft.queries
object StarQueries { val all: Seq[GQuery] = Seq() }
