package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Expression-level sharing helpers.
  *
  * Catalyst performs no common-subexpression elimination across the
  * interpreted (CodegenFallback) higher-order functions this library
  * leans on, and `CollapseProject` re-inlines single-use Project
  * aliases into every downstream reference — so an expensive subtree
  * (tokenization, shingling, a hash array) referenced N times is
  * *evaluated* N times per row (the round-1 10× regression).
  */
object Lambdas {

  /** Let-binding for expressions: evaluate `c` exactly once per row,
    * reference the bound value any number of times inside `f`.
    *
    * Implemented as `transform(array(c), f)[1]`: a higher-order
    * function binds its lambda variable to an evaluated VALUE, and no
    * optimizer rule inlines into a lambda body — unlike a Project
    * alias, this sharing survives the whole optimizer. Overhead is
    * one single-element array allocation per row. */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** Two-value let-binding. */
  def bindOnce2(c1: Column, c2: Column)(f: (Column, Column) => Column): Column =
    bindOnce(c1)(v1 => bindOnce(c2)(v2 => f(v1, v2)))
}
