package graft.tools
import org.apache.spark.sql.functions._
import graft._
import graft.functions.{TextAnalysis, Classify}
/** Dev tool: per-expression timings for the text stack over `documents`
  * (noop write, 2 reps, steady state = rep 2). Round-3 verdict: every
  * op is sub-second at sf0.1 and within ~2x of its pure-codegen core
  * (tokenCount 0.27 s vs bare split 0.16 s) -- single-pass HOFs, unlike
  * the nested 32-hash minhash loops that earned native expressions.
  * Re-run before deciding to nativize anything here.
  */
object ProfileText {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Sessions.local()
    import s.implicits._
    val docs = Tables.documents(s, sfDir).cache()
    docs.count()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      for (r <- 1 to 2)
        println(f"$name rep$r: ${Bench.timeNoop(df)}%.3f s")
    time("tokenCount      ")(docs.select(TextAnalysis.tokenCount($"text").as("n")))
    time("split-size only ")(docs.select(size(split($"text", "\\s+")).as("n")))
    time("fingerprint     ")(docs.select(TextAnalysis.fingerprint($"text").as("f")))
    time("qualityScore    ")(docs.select(TextAnalysis.qualityScore($"text").as("q")))
    time("langId          ")(docs.select(TextAnalysis.langId($"text").as("l")))
    time("bpeTokenCount   ")(docs.select(TextAnalysis.bpeTokenCount($"text").as("n")))
    time("classifier      ")(docs.select(Classify.keywordClassifier($"text",
      Seq("stream"->"S","window"->"W","join"->"J","group"->"G"), "General").as("c")))
    time("rlike filter    ")(docs.filter(Classify.containsAny($"text", Seq("join","merge","group"))).select($"doc_id"))
    s.stop()
  }
}
