package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.kernel.MapReduce

/** The reference-surface query set: one registered query per operator of
  * SURVEY.md §2.1 (O1–O5, O7–O11) plus the flagship §2.2 Search pipeline
  * and a typed-kernel rendition of it.
  *
  * Every query is fully order-determined (unique sort key) or
  * aggregate-only so the DuckDB oracle comparison is well-defined
  * (SURVEY.md §5.2). Scale posture: filters sit directly on scans
  * (pushdown), aggregates are partial-aggregated map-side by Catalyst,
  * sorts are range-partitioned — nothing materializes on the driver.
  */
object RefOps {

  /** The search word for the flagship query (reference:
    * /root/reference/Search.cpp:271-284 takes it from argv).
    */
  val Word = "merge"

  /** The §2.2 Search semantics over any `(dir, name)` relation — the
    * exact observable behavior of `./Search <word> <dirs...>`
    * (Search.cpp:271-307): dot-entry exclusion, case-sensitive literal
    * substring on NAME, merge of equal names across dirs, count,
    * ascending name sort. Unit-tested against the §2.2 edge semantics
    * (empty input, duplicate dirs, case sensitivity, metacharacters).
    */
  def searchFiles(files: DataFrame, word: String): DataFrame =
    files
      .filter(!col("name").isin(".", ".."))
      .filter(col("name").contains(word))
      .groupBy("name")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("name")

  /** Flagship §2.2 pipeline re-hosted on the `documents` table:
    * substring filter (O4) + dot-exclusion (O3) → group-count (O7-O9) →
    * ascending sort (O10). Reference: Search.cpp:203-241,271-307.
    */
  def searchCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(!col("source").isin(".", ".."))     // O3: Search.cpp:213-216
      .filter(col("text").contains(Word))         // O4: Search.cpp:220
      .groupBy("source")                          // O7: MapReduceFramework.cpp:427
      .agg(count(lit(1)).as("cnt"))               // O8/O9: Search.cpp:239
      .orderBy("source")                          // O10: MapReduceFramework.cpp:498

  /** O1: in-memory source — the reference's `initiateList`
    * (Search.cpp:169-181) builds (dir, word) pairs from argv, duplicates
    * allowed (a duplicated directory is scanned twice, SURVEY §2.2).
    */
  def srcInMemory(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Seq(("data/a", Word), ("data/a", Word), ("data/b", Word), ("data/c", Word))
      .toDF("dir", "word")
      .orderBy("dir")
  }

  /** O2: scan source — projection + predicate reaching the parquet scan
    * (PushedFilters + pruned ReadSchema; the Spark upgrade over the
    * reference's readdir loop, Search.cpp:210-227).
    */
  def scanProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 1000)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")

  /** O3: NOT-IN filter (the dot-entry exclusion, Search.cpp:213-216),
    * aggregate-only output.
    */
  def filterNotIn(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(!col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("c_mktsegment")

  /** O4: substring predicate alone (Search.cpp:220), aggregate-only. */
  def filterContains(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_name").contains("red"))
      .agg(count(lit(1)).as("cnt"))

  /** O5: flatMap fan-out 1→0..N (Emit2, Search.cpp:221-224) as relational
    * explode: tokenize a slice of the corpus. Duplicate (doc_id, word)
    * rows are legitimate (same word twice in a doc) and tie identically
    * under the full sort.
    */
  def flatmapExplode(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .orderBy("doc_id", "word")

  /** O7–O9: group-by-key + COUNT per key on the big table. */
  def groupCount(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** O10: global sort with a unique tie-breaker (the reference's final
    * std::sort, MapReduceFramework.cpp:498, is single-threaded; Spark's
    * orderBy is a range-partitioned parallel sort).
    */
  def globalSort(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))

  /** O11: multiplicity expansion — each group row repeated `cnt` times
    * (the reference's print loop, Search.cpp:290-303), as
    * explode(sequence(1, cnt)) with the repeat index kept so the output
    * is fully order-determined.
    */
  def multiplicityExpand(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("text").contains(Word))
      .groupBy("source")
      .agg(count(lit(1)).as("cnt"))
      .select(col("source"),
        explode(sequence(lit(1L), col("cnt"))).as("rep"))
      .orderBy("source", "rep")

  /** The flagship pipeline routed through the typed L1 kernel
    * (graft.kernel.MapReduce.run ≙ RunMapReduceFramework,
    * MapReduceFramework.cpp:621-694): map enumerates the "directory
    * listing" (tokens of a document), keeps entries containing the word,
    * emits (token, 1) [Emit2]; reduce counts [Emit3]; kernel sorts by k3.
    */
  def kernelSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val in = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
    val out = MapReduce.run(in) { (_, text) =>
      text.split(' ').iterator.filter(w => w.nonEmpty && w.contains("mer")).map(w => (w, 1))
    } { (word, ones) =>
      Iterator.single((word, ones.size.toLong))
    }
    out.toDF("word", "cnt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "search_count" -> (searchCount _),
    "src_inmemory" -> (srcInMemory _),
    "scan_project" -> (scanProject _),
    "filter_notin" -> (filterNotIn _),
    "filter_contains" -> (filterContains _),
    "flatmap_explode" -> (flatmapExplode _),
    "group_count" -> (groupCount _),
    "global_sort" -> (globalSort _),
    "multiplicity_expand" -> (multiplicityExpand _),
    "kernel_search" -> (kernelSearch _),
  )

  val oracle: Map[String, String] = Map(
    "search_count" ->
      s"""SELECT source, count(*) AS cnt FROM documents
         |WHERE source NOT IN ('.', '..') AND text LIKE '%$Word%'
         |GROUP BY source ORDER BY source""".stripMargin,
    "src_inmemory" ->
      s"""SELECT * FROM (VALUES ('data/a', '$Word'), ('data/a', '$Word'),
         | ('data/b', '$Word'), ('data/c', '$Word')) AS t(dir, word)
         |ORDER BY dir""".stripMargin,
    "scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_orderkey < 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "filter_notin" ->
      """SELECT c_mktsegment, count(*) AS cnt FROM customer
        |WHERE c_mktsegment NOT IN ('BUILDING', 'MACHINERY')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "filter_contains" ->
      """SELECT count(*) AS cnt FROM part WHERE p_name LIKE '%red%'""",
    "flatmap_explode" ->
      """SELECT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents WHERE doc_id < 50)
        |WHERE word <> '' ORDER BY doc_id, word""".stripMargin,
    "group_count" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "global_sort" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "multiplicity_expand" ->
      s"""SELECT source, unnest(generate_series(1, cnt)) AS rep FROM (
         |  SELECT source, count(*) AS cnt FROM documents
         |  WHERE text LIKE '%$Word%' GROUP BY source) t
         |ORDER BY source, rep""".stripMargin,
    "kernel_search" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' AND word LIKE '%mer%'
        |GROUP BY word ORDER BY word""".stripMargin,
  )
}
