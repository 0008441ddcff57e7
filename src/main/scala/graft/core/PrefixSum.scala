package graft.core

import org.apache.spark.rdd.RDD

/** The two-pass distributed prefix-sum kernel shared by every global-
  * numbering operator (totalSort positions, contiguous row ids, token-budget
  * packs, sequence-packing offsets): pass 1 reduces each partition of a
  * range-sorted RDD to one long and ships |partitions| longs to the driver;
  * the caller's pass 2 then seeds each partition with the broadcast
  * cumulative offset of all earlier partitions.
  *
  * Call it with the SAME RDD object the second pass maps — both passes then
  * reuse one shuffle (the sampled range boundaries are identical), which is
  * what makes the result bit-identical to a single-task window at any
  * partition count. Extracted round 6: three operators had hand-rolled
  * copies of this kernel with drifting details.
  */
object PrefixSum {

  /** `offsets(pid)` = `start` + Σ weight over all partitions before `pid`;
    * the last element is the grand total + start.
    */
  def partitionOffsets[T](rdd: RDD[T], weight: T => Long, start: Long = 0L): Array[Long] = {
    val sums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; while (it.hasNext) { s += weight(it.next()) }; Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    sums.scanLeft(start)(_ + _)
  }
}
