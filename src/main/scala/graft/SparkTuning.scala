package graft

/** Session-level optimizer tuning shared by every graft entry point
  * (Bench, Verify, CopyCli, tests). */
object SparkTuning {

  /** `InferFiltersFromGenerate` clones the generator input into a
    * pushed-down `size(e) > 0 AND e IS NOT NULL` filter. When the
    * exploded array is an expensive computed expression (word shingles,
    * character trigrams), predicate pushdown then inlines the whole
    * computation — including regex splits re-evaluated inside
    * interpreted HOF lambdas — into a per-row filter that runs *in
    * addition to* the projection, a measured ~10× slowdown on the
    * dedup queries. Its only benefit is pruning empty arrays before a
    * Generate, which none of our plans need, so graft sessions exclude
    * the rule. */
  val ExcludedOptimizerRules: String =
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
}
