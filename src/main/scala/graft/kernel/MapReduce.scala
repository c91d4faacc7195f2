package graft.kernel

import org.apache.spark.sql.{Dataset, Encoder}

/** L1: the typed MapReduce kernel — the Spark-native re-expression of the
  * reference's single entry point `RunMapReduceFramework`
  * (/root/reference/MapReduceFramework.cpp:621-694).
  *
  * Shape (SURVEY.md §7.1): the reference's user surface is two
  * flatMap-shaped callbacks — `Map` emitting 0..N (k2,v2) via `Emit2`
  * (/root/reference/Search.cpp:203-229, MapReduceFramework.cpp:228-231)
  * and `Reduce` emitting 0..N (k3,v3) via `Emit3`
  * (/root/reference/Search.cpp:236-241, MapReduceFramework.cpp:240-244) —
  * composed as flatMap → key-grouped shuffle → per-group reduce → global
  * ascending sort by k3 (/root/reference/MapReduceFramework.cpp:498).
  *
  * Instead of emit callbacks into per-thread buffers, user functions here
  * RETURN their emissions (`IterableOnce`) — flatMap's shape absorbs
  * Emit2, flatMapGroups' absorbs Emit3 — so no shared mutable state exists
  * and the same closure runs unchanged on a 1000-executor cluster.
  *
  * Contracts inherited from the reference (SURVEY.md §4.3):
  *  - K2 grouping equality must be consistent with its ordering
  *    (the reference derives equality from `operator<`,
  *    MapReduceFramework.cpp:33-38; Spark's groupByKey groups on the
  *    encoder's serialized binary form of the key, so two keys are one
  *    group iff they encode identically — overriding `equals` does not
  *    affect grouping). True for primitives, Strings and case classes
  *    of them.
  *  - `reduce` must be order-insensitive in its values (the reference's
  *    within-group order is thread-nondeterministic,
  *    MapReduceFramework.cpp:413-431).
  *  - Tie order among equal K3 after the final sort is unspecified
  *    (unstable std::sort, MapReduceFramework.cpp:498).
  *
  * Scale notes: the input never materializes on the driver; the group
  * values arrive as an Iterator (streamed by Spark's external sorter, so
  * a hot key spills rather than OOMs — unlike the reference, which holds
  * everything in RAM); the final sort is a range-partitioned parallel
  * sort rather than the reference's single-threaded std::sort.
  */
object MapReduce {

  /** `multiThreadLevel` and `autoDeleteV2K2` from the reference API
    * intentionally have no analog: parallelism is Spark's scheduler over
    * partitions, memory is the JVM's.
    */
  def run[K1, V1, K2, V2, K3, V3](in: Dataset[(K1, V1)])(
      map: (K1, V1) => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      k2Enc: Encoder[K2],
      kv2Enc: Encoder[(K2, V2)],
      outEnc: Encoder[(K3, V3)]): Dataset[(K3, V3)] = {
    val mapped = in.flatMap { case (k1, v1) => map(k1, v1) } // Emit2
    val reduced = mapped
      .groupByKey(_._1) // the one true shuffle (hash exchange)
      .flatMapGroups((k2, pairs) => reduce(k2, pairs.map(_._2)).iterator) // Emit3
    reduced.orderBy("_1") // global ascending k3 sort (range exchange)
  }
}
