package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.memory.{MemoryConsumer, MemoryMode, TaskMemoryManager}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ofRows

/**
 * Group-wise top-k as a first-class operator: logical plan node +
 * optimizer rule + planner strategy + two-phase physical operator
 * (SURVEY §4.3 ladder step (c), the whole-operator extension point).
 *
 * Why not `row_number().over(window) <= k`? The window formulation
 * shuffles EVERY row of every group, then fully sorts each partition
 * before it can rank — at 100 TB the shuffle carries the entire fact
 * table and the sort spills. Top-k is an aggregation, not a sort:
 * this operator keeps one bounded heap per group and runs in TWO
 * phases like partial/final aggregation — the partial pass caps each
 * map partition's output at k rows per group BEFORE the exchange, so
 * the shuffle moves at most `partitions × groups × k` rows no matter
 * how large the input, and nothing is ever globally sorted.
 *
 * Semantics: the k first rows of each group under `order` (ties
 * beyond the ordering are nondeterministic — give the ordering a
 * unique tiebreak column for deterministic output, as every corpus
 * query does).
 */
object TopKPerGroup {

  /** Entry point. `order` pairs are (columnName, ascending). */
  def apply(df: DataFrame, group: Seq[String], order: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    require(k > 0, s"topKPerGroup: k must be positive, got $k")
    require(group.nonEmpty,
      "topKPerGroup: group columns must be non-empty (global top-k is " +
        "orderBy(...).limit(k) — Spark plans it as TakeOrderedAndProject)")
    val spark = df.sparkSession
    // idempotently register the planner strategy + optimizer rule on
    // whatever session the caller holds — no builder changes needed.
    // Synchronized: apply() is reachable from concurrent driver
    // threads (pqModel's pooled subspace trainings), and the bare
    // check-then-append would racily duplicate or drop a registration.
    spark.experimental.synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerGroupStrategy
      if (!spark.experimental.extraOptimizations.contains(CombineTopK))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ CombineTopK
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute = child.output
      .find(a => spark.sessionState.analyzer.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"topKPerGroup: column '$name' not in ${child.output.map(_.name)}"))
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ofRows(spark, TopKPerGroupNode(group.map(attr), sortOrder, k, child))
  }
}

/** Logical node: declares the semantics, output = child output. */
case class TopKPerGroupNode(group: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Optimizer rule: stacked top-ks over the same keys/ordering collapse
  * to one pass with the smaller k (taking 3 of the top 10 is taking
  * the top 3). */
object CombineTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKPerGroupNode(g1, o1, k1, TopKPerGroupNode(g2, o2, k2, child))
        if g1 == g2 && o1 == o2 =>
      TopKPerGroupNode(g1, o1, math.min(k1, k2), child)
  }
}

/** Planner strategy: final-over-partial, same shape as hash
  * aggregation. EnsureRequirements inserts the single exchange on the
  * group keys between the two phases (the final requires
  * `ClusteredDistribution(group)`, the partial requires nothing). */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(group, order, k, child) =>
      TopKPerGroupExec(group, order, k, partial = false,
        TopKPerGroupExec(group, order, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical operator: one bounded heap per group per partition.
  *
  * Memory: O(min(groups-in-partition, flush threshold) × k) rows in
  * the partial phase — when a map partition's heap table exceeds
  * `PartialFlushGroups` distinct groups OR `spark.graft.topk.spillBytes`
  * tracked bytes (the byte bound is what protects WIDE rows — array
  * columns can blow memory well below any group-count knob), the table
  * is FLUSHED to the output and restarted. Flushing is sound for the
  * partial phase: a row the pre-flush heap would have rejected is only
  * ever an EXTRA row for the final phase to discard, and a row
  * belonging to the partition's true per-group top-k is never rejected
  * (rejection requires k better same-group rows in the current epoch,
  * which are themselves emitted). The final phase SPILLS to disk past
  * the same two bounds (`spark.graft.topk.spillGroups` for groups):
  * the heap table is written as a key-sorted local run (per group: its
  * ≤k survivors in sort order) and restarted; end-of-input merges all
  * runs with the in-memory remainder by key. Per-run group survivors
  * are each ≤ k and the global top-k of a group is contained in the
  * union of its per-run top-ks, so the merge re-selects exactly — a
  * reduce partition owning billions of groups holds at most the
  * threshold's worth of rows plus one group's ≤ runs×k merge buffer,
  * never the partition.
  *
  * The final phase additionally REGISTERS its tracked bytes with the
  * task's `TaskMemoryManager` (as a `MemoryConsumer`): Spark's memory
  * manager sees the heap table next to every other consumer in the
  * task and can force it to spill under pressure, and an acquisition
  * that comes back short triggers an immediate self-spill — so memory
  * safety no longer depends on a human-sized knob at all (the knobs
  * remain as hard caps). Byte accounting is exact UnsafeRow sizes plus
  * a per-entry structure constant, not a SizeEstimator guess. */
case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
                            k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(group))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val limit = k
    val isPartial = partial
    val childOutput = child.output
    val spillGroups = conf.getConfString("spark.graft.topk.spillGroups",
      TopKPerGroupExec.PartialFlushGroups.toString).toInt
    val spillBytes = conf.getConfString("spark.graft.topk.spillBytes",
      TopKPerGroupExec.DefaultSpillBytes.toString).toLong
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val ordering = RowOrdering.create(sortOrder, childOutput)
      // scala PQ surfaces its Ordering's MAX at `head`: under the row
      // ordering that is the row sorting LAST — the worst row kept,
      // exactly the one a better candidate should evict
      val heaps = mutable.HashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      val runs = mutable.ArrayBuffer.empty[File]
      // exact-ish byte accounting for the heap table: UnsafeRow payload
      // bytes + a flat per-entry constant for heap/hash-map structure
      var tableBytes = 0L
      var acquired = 0L // bytes currently held from the TaskMemoryManager
      var consumer: MemoryConsumer = null
      def entrySize(r: InternalRow): Long = 48L + (r match {
        case u: UnsafeRow => u.getSizeInBytes.toLong
        case _ => 16L * childOutput.length
      })
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        runs.foreach(f => if (f.exists()) f.delete())
        if (consumer != null && acquired > 0) {
          consumer.freeMemory(acquired); acquired = 0
        }
      })

      /** Final-phase spill: write the heap table as a key-sorted run
        * — per group its ≤k survivors in sort order — then reset.
        * Sorted by the key's UNSAFE BYTES (any total order shared by
        * every run works; UnsafeRow equality is bytes equality). */
      def spillTable(): Unit = {
        val file = File.createTempFile("graft-topk-spill", ".run")
        runs += file
        val out = new DataOutputStream(new BufferedOutputStream(
          new FileOutputStream(file), 1 << 16))
        try {
          val entries = heaps.toArray.sortWith { (a, b) =>
            java.util.Arrays.compareUnsigned(
              a._1.asInstanceOf[UnsafeRow].getBytes,
              b._1.asInstanceOf[UnsafeRow].getBytes) < 0
          }
          for ((key, heap) <- entries) {
            val kb = key.asInstanceOf[UnsafeRow].getBytes
            out.writeInt(kb.length); out.write(kb)
            val rows = heap.dequeueAll.reverseIterator.toArray
            out.writeInt(rows.length)
            for (r <- rows) {
              val rb = toUnsafe(r).getBytes
              out.writeInt(rb.length); out.write(rb)
            }
          }
          out.writeInt(-1)
        } finally out.close()
        heaps.clear()
        tableBytes = 0
        if (consumer != null && acquired > 0) {
          consumer.freeMemory(acquired); acquired = 0
        }
      }

      // register the final phase's table with the task memory manager:
      // an EXTERNAL pressure callback spills the table (safe out of
      // band — the table only feeds output at end-of-input, and the
      // task is single-threaded so the callback never races an insert)
      if (!isPartial) Option(TaskContext.get()).foreach { tc =>
        val tmm = org.apache.spark.sql.graftbridge.taskMemoryManager(tc)
        consumer = new SpillableHeapTable(tmm,
          () => if (heaps.isEmpty) 0L else { val f = acquired; spillTable(); f })
      }

      /** K-way merge of the spilled runs (the in-memory remainder is
        * spilled first so one code path reads everything): pop the
        * smallest key across runs, pool that group's ≤ runs×k
        * survivors, re-select its top-k. */
      def mergeRuns(): Iterator[InternalRow] = {
        if (heaps.nonEmpty) spillTable()
        val readers = runs.toArray
          .map(new TopKRunReader(_, childOutput.length))
          .filter(_.advance())
        // max-heap + reversed byte order = smallest key at head
        val pq = mutable.PriorityQueue.empty[TopKRunReader](
          (a: TopKRunReader, b: TopKRunReader) =>
            java.util.Arrays.compareUnsigned(b.keyBytes, a.keyBytes))
        readers.foreach(pq.enqueue(_))
        new Iterator[InternalRow] {
          private var cur: Iterator[InternalRow] = Iterator.empty
          private def refill(): Unit = {
            while (!cur.hasNext && pq.nonEmpty) {
              val first = pq.dequeue()
              val key = first.keyBytes
              val pooled = mutable.ArrayBuffer.empty[UnsafeRow]
              pooled ++= first.rows
              val popped = mutable.ArrayBuffer[TopKRunReader](first)
              while (pq.nonEmpty &&
                  java.util.Arrays.equals(pq.head.keyBytes, key)) {
                val r = pq.dequeue(); pooled ++= r.rows; popped += r
              }
              cur = pooled.sortWith(ordering.compare(_, _) < 0)
                .take(limit).iterator
              popped.foreach(r => if (r.advance()) pq.enqueue(r))
            }
          }
          override def hasNext: Boolean = { refill(); cur.hasNext }
          override def next(): InternalRow = { refill(); cur.next() }
        }
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private var inputDone = false

        /** Emit every group's survivors in sort order (cheap: ≤k each)
          * and reset the table. */
        private def drain(): Iterator[InternalRow] = {
          val groups = heaps.values.toArray
          heaps.clear()
          tableBytes = 0
          // release the acquisition too: after the clear the consumer's
          // spill() returns 0, so holding `acquired` would show the
          // TaskMemoryManager phantom pressure no callback can reclaim
          if (consumer != null && acquired > 0) {
            consumer.freeMemory(acquired); acquired = 0
          }
          groups.iterator.flatMap(_.dequeueAll.reverseIterator)
        }

        private def advance(): Unit = {
          while (!out.hasNext && !inputDone) {
            var flushed: Iterator[InternalRow] = Iterator.empty
            while (iter.hasNext && !flushed.hasNext) {
              val row = iter.next()
              // probe before copying: the projection reuses its
              // buffer, so only a first-seen group pays the key copy
              val probe = keyProj(row)
              val heap = heaps.get(probe) match {
                case Some(h) => h
                case None =>
                  if (isPartial &&
                      heaps.size >= TopKPerGroupExec.PartialFlushGroups)
                    flushed = drain()
                  else if (!isPartial && heaps.size >= spillGroups)
                    spillTable()
                  val h = mutable.PriorityQueue.empty[InternalRow](ordering)
                  val key = probe.copy()
                  heaps.put(key, h)
                  tableBytes += entrySize(key) + 48L
                  h
              }
              if (heap.size < limit) {
                val kept = row.copy()
                heap.enqueue(kept)
                tableBytes += entrySize(kept)
              } else if (ordering.compare(row, heap.head) < 0) {
                tableBytes -= entrySize(heap.dequeue())
                val kept = row.copy()
                heap.enqueue(kept)
                tableBytes += entrySize(kept)
              }
              // byte bounds: both phases respect the hard spillBytes
              // cap (wide rows overwhelm group-count knobs); the final
              // phase additionally keeps its TaskMemoryManager
              // acquisition covering tableBytes and self-spills when
              // the manager grants less than the table holds
              if (isPartial) {
                if (tableBytes > spillBytes && !flushed.hasNext)
                  flushed = drain()
              } else if (tableBytes > spillBytes) {
                spillTable()
              } else if (consumer != null && tableBytes > acquired) {
                val granted = consumer.acquireMemory(
                  math.max(tableBytes - acquired, 4L << 20))
                acquired += granted
                if (acquired < tableBytes) spillTable()
              }
            }
            if (flushed.hasNext) out = flushed
            else if (!iter.hasNext) {
              inputDone = true
              out = if (runs.isEmpty) drain() else mergeRuns()
            }
          }
        }

        override def hasNext: Boolean = { advance(); out.hasNext }
        override def next(): InternalRow = { advance(); out.next() }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerGroupExec {
  /** Partial-phase heap-table cap: past this many distinct groups in
    * one map partition, flush-and-restart (soundness argued above).
    * Also the default for the final phase's disk-spill threshold
    * (`spark.graft.topk.spillGroups`). */
  val PartialFlushGroups: Int = 1 << 16

  /** Default byte cap for the heap table in BOTH phases
    * (`spark.graft.topk.spillBytes`): the bound that holds when rows
    * are wide (array/embedding carry columns) and a group-count knob
    * would OOM first. 64 MB per task is far under any sane executor
    * memory / task-slot ratio. */
  val DefaultSpillBytes: Long = 64L << 20
}

/** The final phase's `MemoryConsumer` registration: makes the heap
  * table visible to Spark's task memory manager and lets the manager
  * force a disk spill under pressure. A self-triggered request (the
  * manager asking THIS consumer to free memory while it is inside its
  * own `acquireMemory` call) returns 0 — the caller handles the
  * shortfall by self-spilling, keeping the table mutation on exactly
  * one code path. */
private final class SpillableHeapTable(tmm: TaskMemoryManager,
                                       doSpill: () => Long)
    extends MemoryConsumer(tmm, tmm.pageSizeBytes(), MemoryMode.ON_HEAP) {
  override def spill(size: Long, trigger: MemoryConsumer): Long =
    if (trigger eq this) 0L else doSpill()
}

/** Sequential reader over one spilled run: (keyBytes, that group's
  * ≤k rows in sort order) per advance(); deletes the file at EOF. */
private final class TopKRunReader(file: File, numRowFields: Int) {
  private val in = new DataInputStream(new BufferedInputStream(
    new FileInputStream(file), 1 << 16))
  var keyBytes: Array[Byte] = _
  var rows: Array[UnsafeRow] = _
  def advance(): Boolean = {
    val kl = in.readInt()
    if (kl < 0) { in.close(); file.delete(); false }
    else {
      keyBytes = new Array[Byte](kl); in.readFully(keyBytes)
      rows = Array.fill(in.readInt()) {
        val rb = new Array[Byte](in.readInt()); in.readFully(rb)
        val r = new UnsafeRow(numRowFields); r.pointTo(rb, rb.length); r
      }
      true
    }
  }
}
