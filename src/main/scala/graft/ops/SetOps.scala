package graft.ops

import org.apache.spark.sql.DataFrame

/** Set operations (SURVEY.md §2.7: U0/U2).
  *
  * The reference's only set op is the stage→target INSERT (bag union,
  * REF wistia_stored_procedures.py:14-36,60-80) = [[unionAll]]. The distinct
  * variants complete the relational surface. All distinct set ops cost one
  * shuffle on the full row; prefer keyed anti/semi joins when only a key
  * column matters.
  */
object SetOps {
  /** U0: bag union by column name (stage insert). */
  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  /** U2: set union (distinct). */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** U2: set intersection (distinct). */
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  /** U2: set difference (distinct). */
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
