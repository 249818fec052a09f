package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language-ID heuristic, quality scoring, token counting, document
  * fingerprinting. All hot-path arithmetic uses Spark's codegen'd built-in /
  * higher-order functions (no Scala UDFs), with integer-exact formulas that a
  * SQL oracle can reproduce verbatim.
  */
object TextAnalysis {

  final val P = 1000000007L

  /** SQL fragment (shared Spark/DuckDB dialect subset): polynomial char hash
    * of a word — fold of (a*31 + ascii(char)) mod P. */
  def wordHashSqlSpark(w: String): String =
    s"aggregate(transform(sequence(1, length($w)), i -> cast(ascii(substring($w, i, 1)) as bigint)), " +
      s"cast(0 as bigint), (a, x) -> (a * 31 + x) % $P)"

  def wordHashSqlDuck(w: String): String =
    s"list_reduce(list_transform(generate_series(1, length($w)), i -> ascii(substr($w, i, 1))::BIGINT), " +
      s"(a, x) -> (a * 31 + x) % $P)"

  /** Ordered document fingerprint: left fold of (a*131 + wordHash) mod P over
    * the word sequence — a rolling-hash id that is order-sensitive (two
    * permuted documents fingerprint differently). */
  def fingerprintSqlSpark(textCol: String): String =
    s"aggregate(transform(split($textCol, ' '), w -> ${wordHashSqlSpark("w")}), " +
      s"cast(0 as bigint), (a, x) -> (a * 131 + x) % $P)"

  def fingerprintSqlDuck(textCol: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($textCol, ' '), w -> ${wordHashSqlDuck("w")})), " +
      s"(a, x) -> (a * 131 + x) % $P)"

  /** Native codegen form of [[fingerprintSqlSpark]] (value-identical —
    * parity pinned by OperatorsSpec; the SQL chain interprets ~5 lambda
    * frames per character, see [[TextHash]]). */
  def fingerprint(textColName: String): Column = TextHash.fingerprintCol(col(textColName))

  /** Whitespace token count. */
  def tokenCount(textCol: Column): Column = size(split(textCol, " "))

  /** BPE-ish subword proxy: alpha runs + digit runs counted separately
    * ("ab12cd" -> 3). RE2-safe pattern so a DuckDB oracle matches exactly. */
  def subwordCount(textCol: Column): Column =
    size(regexp_extract_all(textCol, lit("[a-zA-Z]+|[0-9]+"), lit(0)))

  /** Marker-word languages for the n-gram/stopword language-ID heuristic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "data", "table"),
    "fr" -> Seq("le", "vector", "line"),
    "de" -> Seq("der", "stream", "group"),
    "es" -> Seq("query", "row", "filter"),
    "zh" -> Seq("spark", "merge", "batch"))

  private def markerCount(words: Column, markers: Seq[String]): Column =
    size(filter(words, (w: Column) => w.isInCollection(markers)))

  /** Language-ID: argmax of per-language marker-word counts, deterministic
    * first-wins tie-break in declaration order. Returns (scores..., pred). */
  def langId(textCol: Column): Seq[(String, Column)] = {
    val words = split(textCol, " ")
    val scores = langMarkers.map { case (l, ms) => l -> markerCount(words, ms) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
    scores :+ ("pred" -> pred)
  }

  /** Quality score in pure integer arithmetic (oracle-exact, `div` not `/`
    * — Spark's `/` on ints is double division): a 0-100 blend of stopword
    * ratio, mean word length band, and length band — the standard
    * heuristic-prefilter shape used on web corpora. */
  def qualityScoreSqlSpark(textCol: String): String = {
    val n = s"size(split($textCol, ' '))"
    val stop = s"size(filter(split($textCol, ' '), w -> w in ('the','a','of','and','data','table','row')))"
    val avgLenX10 = s"((length($textCol) - $n + 1) * 10 div greatest($n, 1))"
    s"""cast(least(($stop * 100) div greatest($n, 1) * 4, 40)
       | + (case when $n between 20 and 200 then 30 when $n between 5 and 500 then 15 else 0 end)
       | + (case when $avgLenX10 between 30 and 80 then 30 when $avgLenX10 between 20 and 120 then 15 else 0 end)
       | as bigint)""".stripMargin
  }

  def qualityScoreSqlDuck(textCol: String): String = {
    val n = s"len(string_split($textCol, ' '))"
    val stop = s"len(list_filter(string_split($textCol, ' '), w -> w in ('the','a','of','and','data','table','row')))"
    val avgLenX10 = s"((length($textCol) - $n + 1) * 10 // greatest($n, 1))"
    s"""cast(least(($stop * 100) // greatest($n, 1) * 4, 40)
       | + (case when $n between 20 and 200 then 30 when $n between 5 and 500 then 15 else 0 end)
       | + (case when $avgLenX10 between 30 and 80 then 30 when $avgLenX10 between 20 and 120 then 15 else 0 end)
       | as bigint)""".stripMargin
  }

  def qualityScore(textColName: String): Column = expr(qualityScoreSqlSpark(textColName))
}
