package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator plan: per-key top-k WITHOUT a sort.
  *
  * The stock way to take the top k rows per key is
  * `row_number().over(Window.partitionBy(keys).orderBy(...)) <= k`,
  * which shuffles on the keys and then FULLY SORTS every partition —
  * O(n log n) in partition size, materializing rank for rows that are
  * immediately discarded. For small k this operator keeps a bounded
  * heap per key instead: one pass, O(n log k), no sort buffer — at
  * 100 TB with k=3 the difference is sorting ~0 bytes versus sorting
  * everything.
  *
  * MEMORY BOUND + SPILL FALLBACK: the heap map holds
  * `distinct-keys-per-partition × k` rows in executor memory — any
  * input row may still improve any key's heap, so nothing can be
  * emitted early. Retained bytes are tracked per task; past
  * `spark.graft.topk.maxTaskRetainedBytes` (default 64 MiB) the task
  * DEGRADES to a disk-spilling external sort on (keys asc, order) —
  * Spark's own `UnsafeExternalRowSorter`, the same machinery behind
  * `SortExec` — followed by a streaming first-k-per-group pass. Same
  * rows out, O(n log n) instead of O(n log k), but never an OOM: a
  * skewed or misjudged key cardinality costs a sort, not a task.
  * Rules of thumb:
  *   - retained bytes ≈ keysPerPartition × k × avgRowSize; raise
  *     `spark.sql.shuffle.partitions` to thin keys per partition and
  *     stay on the heap fast path;
  *   - the output of the operator is the same set of rows, so if the
  *     RESULT (keys × k) is too big per partition, so was the plan.
  * The automatic rewrite ([[TopKRewriteRule]]) additionally only fires
  * when the child's estimated size suggests the retained set fits
  * (retained ≤ input), keeping the stock window plan for children that
  * would mostly sort anyway.
  *
  * Pieces (the (c) path from the builder prompt):
  *   - [[TopKPerKey]] — the logical node;
  *   - [[TopKPerKeyStrategy]] — a [[SparkStrategy]] planning it to
  *     [[TopKPerKeyExec]], registered via
  *     [[GraftExtensions]]/`injectPlannerStrategy`;
  *   - [[TopKPerKeyExec]] — physical operator, planned TWO-PHASE like
  *     hash aggregation: a map-side `partial = true` instance (no
  *     distribution requirement, byte-budget passthrough degrade)
  *     feeding a post-shuffle exact instance declaring
  *     `ClusteredDistribution(keys)`, so Catalyst inserts exactly one
  *     hash shuffle between them (and can satisfy it for free if the
  *     child is already clustered, e.g. bucketed input). The shuffle
  *     ships ≤ keys × k rows per map task, not the child — a
  *     low-cardinality key set over a corpus-sized child (10 probe
  *     terms, 3 regions) stops being a reducer chokepoint.
  */
final case class TopKPerKey(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    rankOutput: Option[Attribute] = None) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  // `rankOutput`: optionally ALSO emit the within-key rank (1..k, the
  // exact row_number the window idiom would have produced) as a new
  // trailing column — lets the rewrite fire even when the rank is
  // still referenced above the filter (e.g. q76 regresses on log rank).
  // The heap already drains best-first, so the rank is the emission
  // index: no sort reintroduced.
  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet =
    AttributeSet(rankOutput.toSeq)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, rankOutput) =>
      // Two-phase plan, the partial-aggregation shape: a map-side
      // top-k pass BEFORE the exchange (top-k per key is a monoid —
      // the global top-k is contained in the union of per-partition
      // top-ks), then the exact pass after it. The partial exec
      // declares no distribution requirement, the final one declares
      // ClusteredDistribution, so Catalyst inserts the hash shuffle
      // between them — shipping ≤ keys × k rows per map task instead
      // of the whole child. Low-cardinality keys (e.g. 10 probe terms
      // over a corpus-sized posting stream) stop being a shuffle
      // chokepoint; high-cardinality partials self-disable via the
      // byte-budget passthrough (see doExecute).
      TopKPerKeyExec(keys, order, k,
        TopKPerKeyExec(keys, order, k, planLater(child),
          rankOutput = None, partial = true),
        rankOutput) :: Nil
    case _ => Nil
  }
}

final case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    rankOutput: Option[Attribute] = None,
    partial: Boolean = false) extends UnaryExecNode {
  require(!partial || rankOutput.isEmpty,
    "partial pass cannot emit rank (only the post-shuffle pass sees a key whole)")

  override def output: Seq[Attribute] = child.output ++ rankOutput
  override def producedAttributes: AttributeSet =
    AttributeSet(rankOutput.toSeq)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKey"

  /** Final pass: one hash shuffle on the keys; no sort requirement —
    * the heap replaces it. Partial pass: runs wherever the child is. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.schema
    val keyExprs = keys
    val sortExprs = order
    val childOutput = child.output
    val kk = k
    val emitRank = rankOutput.isDefined
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields ++ rankOutput.map(a =>
        org.apache.spark.sql.types.StructField(a.name, a.dataType,
          nullable = false)))
    val budget = conf.getConfString(TopKPerKey.MaxTaskRetainedBytesKey,
      TopKPerKey.DefaultMaxTaskRetainedBytes.toString).toLong
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortExprs, childOutput)
      // Max-heap on the ordering: the heap root is the WORST retained
      // row; a new row replaces it when strictly better.
      val heapOrd = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      var retainedBytes = 0L
      var overBudget = false
      while (iter.hasNext && !overBudget) {
        val unsafe = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(unsafe)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk, heapOrd)
          val keyCopy = key.copy()
          heaps.put(keyCopy, heap)
          retainedBytes += keyCopy.getSizeInBytes
        }
        if (heap.size < kk) {
          val c = unsafe.copy()
          heap.add(c)
          retainedBytes += c.getSizeInBytes
        } else if (ordering.compare(unsafe, heap.peek()) < 0) {
          retainedBytes -= heap.poll().getSizeInBytes
          val c = unsafe.copy()
          heap.add(c)
          retainedBytes += c.getSizeInBytes
        }
        if (budget >= 0 && retainedBytes > budget) overBudget = true
      }
      import scala.jdk.CollectionConverters._
      // Rank append (when requested): the emission order below is
      // best-first within each key on BOTH paths, so the rank is just
      // the emission index — projected once per EMITTED row (≤ k per
      // key), not per input row.
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      lazy val rankProj = UnsafeProjection.create(outSchema)
      def withRank(row: InternalRow, rank: Int): InternalRow =
        if (!emitRank) row
        else {
          rankRow.setInt(0, rank)
          rankProj(joined(row, rankRow))
        }
      if (!overBudget) {
        // Fast path: drain lazily, one heap at a time (k rows of
        // scratch) — a single output buffer would duplicate every
        // retained row and double the operator's peak memory.
        heaps.values().iterator().asScala.flatMap { h =>
          val rows = new Array[UnsafeRow](h.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = h.poll(); i -= 1 } // heap pops worst-first
          if (!emitRank) rows.iterator
          else rows.iterator.zipWithIndex.map { case (r, idx) =>
            withRank(r, idx + 1)
          }
        }
      } else if (partial) {
        // Partial pass over budget: the map-side top-k is only an
        // OPTIMIZATION — any superset of the true per-partition top-k
        // is a correct input to the exact post-shuffle pass. So a
        // partial task that blows its byte budget simply stops
        // filtering: drain what the heaps retained (evicted rows were
        // provably beaten by k better same-key rows and stay dropped),
        // then pass the unexamined remainder through untouched. The
        // bad case (key cardinality ≈ input) costs one heap-building
        // scan and then self-disables — it never sorts.
        heaps.values().iterator().asScala.flatMap { h =>
          val rows = new Array[UnsafeRow](h.size)
          var i = rows.length - 1
          while (i >= 0) { rows(i) = h.poll(); i -= 1 }
          rows.iterator
        } ++ iter.map(_.asInstanceOf[UnsafeRow])
      } else {
        // Degraded path: too many distinct keys for the in-memory
        // budget. Hand everything retained so far plus the rest of the
        // input to Spark's disk-spilling external sorter, ordered by
        // (keys asc, order), then stream the first k rows of each key
        // group. Correct for any cardinality; costs the sort the fast
        // path exists to avoid.
        import org.apache.spark.sql.catalyst.expressions.Ascending
        import org.apache.spark.sql.execution.UnsafeExternalRowSorter
        import org.apache.spark.util.collection.unsafe.sort.PrefixComparators
        val fullOrder =
          keyExprs.map(e => SortOrder(e, Ascending)) ++ sortExprs
        val sortOrdering = GenerateOrdering.generate(fullOrder, childOutput)
        val zeroPrefix = new UnsafeExternalRowSorter.PrefixComputer {
          private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = p
        }
        val sorter = UnsafeExternalRowSorter.create(
          schema, sortOrdering, PrefixComparators.LONG, zeroPrefix,
          org.apache.spark.sql.graft.CatalystBridge.pageSizeBytes,
          /* canUseRadixSort = */ false)
        heaps.values().iterator().asScala.foreach { h =>
          var r = h.poll()
          while (r != null) { sorter.insertRow(r); r = h.poll() }
        }
        heaps.clear()
        while (iter.hasNext) {
          sorter.insertRow(iter.next().asInstanceOf[UnsafeRow])
        }
        val sorted = sorter.sort()
        // NB: the sorter's iterator REUSES its output row buffer, so
        // the scan must stay strictly demand-driven — a returned row
        // is valid only until the next call into this iterator.
        new Iterator[InternalRow] {
          private var prevKey: UnsafeRow = _
          private var emitted = 0
          private var pending: InternalRow = _
          override def hasNext: Boolean = {
            while (pending == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyProj(row)
              if (prevKey == null || !key.equals(prevKey)) {
                prevKey = key.copy()
                emitted = 0
              }
              if (emitted < kk) {
                emitted += 1
                // withRank materializes into the projection's own
                // buffer, so the sorter's row reuse stays safe.
                pending = withRank(row, emitted)
              }
            }
            pending != null
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException("empty iterator")
            val r = pending
            pending = null
            r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** Per-TASK byte budget for the in-memory heap map; past it the task
    * degrades to a disk-spilling external sort (see
    * [[TopKPerKeyExec.doExecute]]). `-1` disables the guard. */
  val MaxTaskRetainedBytesKey = "spark.graft.topk.maxTaskRetainedBytes"
  val DefaultMaxTaskRetainedBytes: Long = 64L * 1024 * 1024

  /** One sort key: column name + direction. */
  final case class Key(name: String, ascending: Boolean = true)
  def asc(name: String): Key = Key(name, ascending = true)
  def desc(name: String): Key = Key(name, ascending = false)

  /** DataFrame-level entry: top `k` rows per `keyNames` group by
    * `order`. Names are resolved against the frame's analyzed output
    * (a custom logical node doesn't get analyzer expression
    * resolution, so unresolved Column trees can't be accepted here).
    * Registers the planner strategy on first use. */
  def apply(
      df: org.apache.spark.sql.DataFrame,
      keyNames: Seq[String],
      order: Seq[Key],
      k: Int): org.apache.spark.sql.DataFrame = {
    // The FRAME's session, never SparkSession.active: the thread-local
    // active/default session can point at another concurrently-created
    // session (test harnesses, notebook forks), and registering the
    // strategy there while the frame plans HERE yields
    // "No plan for TopKPerKey" at physical planning.
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }
    val plan = org.apache.spark.sql.graft.CatalystBridge.logicalPlan(df)
    def attr(name: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    org.apache.spark.sql.graft.CatalystBridge.ofRows(spark,
      TopKPerKey(
        keyNames.map(attr),
        order.map(o => SortOrder(attr(o.name),
          if (o.ascending) Ascending else Descending)),
        k, plan))
  }
}
