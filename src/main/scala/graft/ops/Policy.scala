package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row/column security policies applied FROM DATA — the governance layer a
  * multi-tenant lakehouse puts between raw tables and consumers (the shape
  * of Snowflake masking policies / Databricks column masks, re-expressed as
  * a plain DataFrame rewrite). A policy table drives the projection, so
  * adding a role or tightening a mask is a data change, not a code deploy.
  *
  * Scale shape: the policy table is a few rows per role (collected once —
  * it is METADATA, never corpus-sized); the output plan is one filter +
  * one projection per role over the input, all codegen'd CASE/hash
  * expressions — zero extra shuffles, and Catalyst pushes the row-filter
  * predicate into the scan per branch.
  */
object Policy {

  /** One rule: mask `column` with `action` for `role`. Supported actions:
    * `redact_tail` (keep the first `arg` chars, replace the rest with ***),
    * `nullify`, `md5`, and the pseudo-column `__row_filter__` whose action
    * is a SQL predicate string. Unknown actions fail loudly at build time —
    * a typo'd policy must never silently pass data through unmasked. */
  final case class Rule(role: String, column: String, action: String,
                        arg: String)

  def applyPolicy(df: DataFrame, rules: Seq[Rule], roles: Seq[String],
                  keepCols: Seq[String]): DataFrame = {
    // Validate the WHOLE policy table up front, not just the action strings:
    // a typo'd column name would otherwise miss the masks map and silently
    // pass data through unmasked, and a typo'd role would orphan its rules.
    val keepSet = keepCols.toSet
    val roleSet = roles.toSet
    rules.foreach { r =>
      require(roleSet.contains(r.role),
        s"policy rule for unknown role '${r.role}' (column ${r.column}): " +
          s"roles are $roles")
      if (r.column != "__row_filter__")
        require(keepSet.contains(r.column),
          s"policy rule for role '${r.role}' names column '${r.column}' " +
            s"not in keepCols $keepCols — refusing to silently skip a mask")
    }
    val byRole = rules.groupBy(_.role)
    roles.map { role =>
      val rs = byRole.getOrElse(role, Seq.empty)
      val masks = rs.filterNot(_.column == "__row_filter__")
        .map(r => r.column -> r).toMap
      val bad = rs.filterNot(_.column == "__row_filter__")
        .map(_.action).filterNot(Set("redact_tail", "nullify", "md5"))
      require(bad.isEmpty, s"unknown policy action(s) for role $role: $bad")
      val filtered = rs.find(_.column == "__row_filter__")
        .map(r => df.filter(expr(r.action))).getOrElse(df)
      val cols: Seq[Column] = lit(role).as("role") +: keepCols.map { c =>
        masks.get(c) match {
          case Some(Rule(_, _, "redact_tail", arg)) =>
            val keep = scala.util.Try(arg.toInt).getOrElse(
              throw new IllegalArgumentException(
                s"redact_tail arg '$arg' for role $role column $c is not " +
                  "an integer"))
            concat(substring(col(c).cast("string"), 1, keep), lit("***")).as(c)
          case Some(Rule(_, _, "nullify", _)) =>
            lit(null).cast(df.schema(c).dataType).as(c)
          case Some(Rule(_, _, "md5", _)) =>
            md5(col(c).cast("string")).as(c)
          case _ => col(c)
        }
      }
      filtered.select(cols: _*)
    }.reduce(_.unionByName(_))
  }
}
