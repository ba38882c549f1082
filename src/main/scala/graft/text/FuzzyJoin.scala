package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy self-join via deletion neighborhoods (the
  * SymSpell blocking scheme): two strings are within Levenshtein
  * distance 1 iff their deletion neighborhoods (the string itself plus
  * every 1-character deletion) intersect — substitutions meet at the
  * deletion of the differing position, insert/delete meet at the shorter
  * string, equal strings meet at themselves. Candidates from the
  * neighborhood equi-join are then verified with the exact `levenshtein`
  * expression, so the result is EXACT: the blocking only bounds work, it
  * never decides membership.
  *
  * Scale shape: each row explodes to len+1 variant keys (short keys —
  * names, titles, SKUs), candidates come from ONE hash equi-join on the
  * variant key, and verification is row-local. Never a cross join — the
  * all-pairs form exists only in the DuckDB oracle. Variant-key skew
  * (mass-duplicated strings) is bounded the same way the LSH bucket
  * guard works: identical strings collapse to one representative per
  * key before pairing (`distinct` on the variant table).
  */
object FuzzyJoin {

  /** Deletion neighborhood: the string plus each delete-one-char
    * variant, tagged so the join can't pair a string with itself.
    */
  private def variants(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(col(idCol), col(strCol),
        explode(array_union(
          array(col(strCol)),
          transform(sequence(lit(1), length(col(strCol))),
            i => concat(
              col(strCol).substr(lit(1), i - lit(1)),
              col(strCol).substr(i + lit(1), length(col(strCol)))))))
          .as("variant"))
      .distinct()

  /** All unordered pairs (idA < idB) of rows whose strings are within
    * Levenshtein distance 1; emits both strings and the exact distance.
    */
  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val v = variants(df, idCol, strCol)
    val a = v.select(col(idCol).as("id_a"), col(strCol).as("str_a"), col("variant"))
    val b = v.select(col(idCol).as("id_b"), col(strCol).as("str_b"), col("variant"))
    a.join(b, Seq("variant"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "str_a", "str_b")
      .distinct() // neighborhoods can meet at several variants
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")))
      .filter(col("dist") <= 1)
  }

  /** Two-sided edit-distance-≤1 join (query terms ⋈ vocabulary) via
    * the same deletion-neighborhood blocking: each side explodes its
    * delete-one variants, candidates meet on a shared variant key (a
    * uniform-key equi join — never |Q|×|V|), and the exact Levenshtein
    * check inside the join prunes false candidates. Output one row per
    * distinct (q, v) pair: (q, v, dist). The spell-suggest primitive.
    */
  def editDistance1Join(left: DataFrame, leftCol: String,
      right: DataFrame, rightCol: String): DataFrame = {
    // variants first, rename after: aliasing c→out and referencing c in
    // the same select trips the lateral-column-alias resolver when the
    // input is already named like the output
    def vars(df: DataFrame, c: String, out: String) =
      df.filter(length(col(c)) > 0)
        .select(col(c),
          explode(array_union(
            array(col(c)),
            transform(sequence(lit(1), length(col(c))),
              i => concat(
                col(c).substr(lit(1), i - lit(1)),
                col(c).substr(i + lit(1), length(col(c)))))))
            .as("__k"))
        .withColumnRenamed(c, out)
        .distinct()
    vars(left, leftCol, "q").join(vars(right, rightCol, "v"), Seq("__k"))
      .select("q", "v").distinct()
      .withColumn("dist", levenshtein(col("q"), col("v")))
      .filter(col("dist") <= 1)
  }
}
