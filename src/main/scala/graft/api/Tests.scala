package graft.api

import org.apache.spark.sql.functions.col

/** C22 — data tests as runtime objects (ref: `DbtTest` dispatch,
  * `/root/reference/projects/adapter/src/fal/dbt/integration/
  * project.py:94-172`: generic column-bound tests + singular SQL
  * tests). A test counts violations over the materialized model; the
  * runner executes a model's tests right after its write and promotes
  * the status to "tested" (ref `project.py:176-188`) or fails the node.
  */
final case class TestDef(
    name: String,
    model: String,
    violations: FalApi => Long)

object Tests {

  /** Generic `not_null` (schema.yml column test). */
  def notNull(model: String, column: String): TestDef =
    TestDef(s"not_null_${model}_$column", model,
      api => api.ref(model).filter(col(column).isNull).count())

  /** Generic `unique` (compiles to group-by-having like dbt's). */
  def unique(model: String, column: String): TestDef =
    TestDef(s"unique_${model}_$column", model,
      api => api.ref(model).groupBy(column)
        .count().filter(col("count") > 1).count())

  /** Generic `relationships`: every value of `column` must exist in
    * `refModel.refColumn` (anti-join violation count).
    */
  def relationship(model: String, column: String, refModel: String,
      refColumn: String): TestDef =
    TestDef(s"relationships_${model}_${column}__$refModel", model,
      api => api.ref(model)
        .join(api.ref(refModel),
          col(column) === col(refColumn), "left_anti").count())

  /** Singular test: any returned row is a violation (ref
    * `tests/customer_lifetime_value.sql`).
    */
  def singular(name: String, model: String,
      query: FalApi => org.apache.spark.sql.DataFrame): TestDef =
    TestDef(name, model, api => query(api).count())
}
