package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Ordered-pair expansion over grouped posting lists.
  *
  * The classic inverted-index pair generator is a posting self-join
  * (`p.as("a").join(p.as("b"), a.key === b.key && a.id < b.id)`): the
  * posting is shuffled twice, sort-merge-joined, and the full pair stream
  * then shuffles again into the pair aggregate. Grouping the posting once
  * (`groupBy(key).agg(collect_list)`) and expanding the i<j pairs INSIDE
  * the row turns the join into a pure projection — one shuffle and no
  * join, producing the identical pair stream. Only safe when posting
  * lists are bounded (df-capped shingle postings, LSH band buckets):
  * expansion is O(len²) per key, and the collect_list buffer is O(len),
  * so the cap must be enforced BEFORE grouping at true scale (the dedup
  * operators pre-filter with a count + semi-join, never relying on a
  * post-agg filter to bound memory).
  */
object Pairs {

  /** All (a, b) element pairs of `arr` with a before b in `array_sort`
    * order. Elements may be any orderable type — longs, or structs
    * (ordered by their first field, e.g. `struct(doc_id, payload)`).
    * Returns `array<struct<a, b>>`; `explode` it to get the pair stream
    * a self-join would have produced. */
  def orderedPairs(arr: Column): Column = {
    val sorted = array_sort(arr)
    flatten(transform(sorted, (x, i) =>
      transform(slice(sorted, i + lit(2), size(sorted)), y =>
        struct(x.as("a"), y.as("b")))))
  }
}
