package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point lookups and the two "authoritative template" queries the
  * reference's NL front-end compiles to (src/llm_cypher.py:85-102):
  * single-student detail and two-name pair relationship.
  */
object StudentQueries {

  /** S2 — `MATCH (s:Student {id: $id})` point lookup
    * (student_service.py:110-132). Parquet predicate pushdown makes this a
    * row-group-pruned scan, not a full read. */
  def byId(students: DataFrame, id: Long): DataFrame =
    students.filter(col("id") === lit(id))

  /** P2 — case-insensitive name equality (the sanitizer's canonical form,
    * llm_cypher.py:165-183): `WHERE toLower(s.name) = toLower($name)`. */
  def byName(students: DataFrame, name: String): DataFrame =
    students.filter(lower(col("name")) === lit(name.toLowerCase)).limit(1)

  /** J6 — existence guard before recommending (student_service.py:139-144),
    * generalized to a semi-join when used in a pipeline. */
  def existing(students: DataFrame, ids: DataFrame): DataFrame =
    students.join(ids, Seq("id"), "left_semi")

  /** U4's deterministic renderer (`explain_result`, llm_cypher.py:248-289 —
    * the non-LLM fallback): per-student "Name/Address/College/Board/Stream"
    * field blocks joined under the header, or the sorry-string when empty.
    * A null field's line is skipped, matching the reference exactly: Neo4j
    * omits null properties from `record.data()`, so its `if "address" in
    * student` guard drops the line — here `concat` nulls the line and
    * `concat_ws` drops it. Ordered by id via the same sort_array technique
    * as the response envelope; one row out, bounded by the result size. */
  def explainStudents(students: DataFrame): DataFrame = {
    val hasInterests = students.columns.contains("interests")
    val detail = concat_ws("\n",
      (Seq(
        concat(lit("Name: "), col("name")),
        concat(lit("Address: "), col("address")),
        concat(lit("College: "), col("college")),
        concat(lit("Board: "), col("board")),
        concat(lit("Stream: "), col("stream"))) ++
       (if (hasInterests)
          Seq(concat(lit("Interests: "), array_join(col("interests"), ", ")))
        else Nil)): _*)
    students.select(col("id"), detail.as("d"))
      .agg(sort_array(collect_list(struct(col("id"), col("d")))).as("arr"))
      .select(
        when(size(col("arr")) === 0,
          lit("I'm sorry, but I couldn't find any students matching your query in the database."))
        .otherwise(concat(
          lit("I found the following students matching your query:\n\n"),
          array_join(transform(col("arr"), x => x("d")), "\n\n")))
        .as("response"))
  }

  /** J4 — the two-name relationship template (llm_cypher.py:86-96):
    *   MATCH (a {name: $n1}), (b {name: $n2})
    *   OPTIONAL MATCH p = (a)-[r]-(b)
    *   RETURN a.*, b.*, type(r), properties(r), a.college = b.college AS ...
    * Pair details survive even when no edge exists (left outer), and the
    * undirected `-[r]-` pattern must probe BOTH orientations of the directed
    * edge table (edges stored with src < dst, create_relationships.py:19).
    *
    * `properties(r)` parity (llm_cypher.py:91): every edge column beyond the
    * (src, dst, rel_type) key is an edge property and passes through the
    * projection — e.g. a SHARES_INTEREST edge's `common` array
    * (create_relationships.py:85) surfaces next to `rel_type`.
    *
    * Physical shape: both name filters reduce to ≤1 row each, so the a×b
    * pair is a 1-row broadcast cross; the edge probe is a broadcast join of
    * the 1-row pair against `edges` — at scale this is a pushdown-filtered
    * scan of the edge table on (src, dst).
    */
  def pairRelationship(
      students: DataFrame, edges: DataFrame,
      name1: String, name2: String): DataFrame = {
    // When the student table carries interests, the template's
    // `[x IN a.interests WHERE x IN b.interests] AS common_interests`
    // (llm_cypher.py:99) is projected too — RAW membership, a's order,
    // exactly as written (the template does not normalize here).
    val hasInterests = students.columns.contains("interests")
    val sideCols = Seq("id", "name", "college", "board", "stream") ++
      (if (hasInterests) Seq("interests") else Nil)
    def side(name: String, p: String) =
      students.filter(lower(col("name")) === lit(name.toLowerCase)).limit(1)
        .select(sideCols.map(c => col(c).as(s"${p}_$c")): _*)
    val a = side(name1, "a")
    val b = side(name2, "b")
    val pair = broadcast(a).crossJoin(broadcast(b))
    // Undirected probe: union BOTH orientations of the directed edge table
    // and join on plain (src, dst) equality — an OR-of-orientations join
    // condition has no equi keys, so Catalyst would fall back to a
    // nested-loop probe over the whole edge table; the doubled-orientation
    // equi-join keeps (src, dst) pushdown/broadcast-hash-join viable at any
    // edge count. Edges are stored src < dst, so the two orientations are
    // disjoint and the union introduces no duplicate matches.
    val bothOrientations = edges.unionByName(
      edges.withColumnRenamed("src", "tmp")
        .withColumnRenamed("dst", "src").withColumnRenamed("tmp", "dst")
        .select(edges.columns.toIndexedSeq.map(col): _*))
    val propCols = edges.columns.filterNot(Set("src", "dst", "rel_type")).toSeq
    val interestCols =
      if (hasInterests)
        Seq(filter(col("a_interests"),
          x => array_contains(col("b_interests"), x)).as("common_interests"))
      else Nil
    pair.join(bothOrientations,
      col("src") === col("a_id") && col("dst") === col("b_id"), "left_outer")
      .select(
        Seq(col("a_id"), col("a_name"), col("b_id"), col("b_name"),
          col("rel_type")) ++
        propCols.map(col) ++ Seq(
          (col("a_college") === col("b_college")).cast("int").as("same_college"),
          (col("a_board") === col("b_board")).cast("int").as("same_board"),
          (col("a_stream") === col("b_stream")).cast("int").as("same_stream")) ++
        interestCols: _*)
      .orderBy(col("rel_type"))
      .limit(25) // the template's LIMIT 25 (llm_cypher.py:96)
  }
}
