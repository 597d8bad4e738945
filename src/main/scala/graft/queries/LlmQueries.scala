package graft.queries
object LlmQueries { val all: Seq[GQuery] = Seq() }
