package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Count-Min sketch (Cormode & Muthukrishnan 2005) — the
  * unbounded-stream frequency counter beside [[StreamTopK]]'s
  * Space-Saving top-k: each (row, bucket) cell is one GroupState long,
  * incremented per arrival; the full sketch is depth·width cells of
  * state TOTAL, independent of stream length and key cardinality.
  *
  * Counter increments are associative and commutative, so the final
  * cell values are EXACTLY the batch sketch's — independent of
  * micro-batch splits and arrival order (the split-invariance spec) —
  * which is what makes the streaming sketch hash-checkable against the
  * batch twin (`st_cms` = a47's counter table), not just error-bounded.
  * Hash family shared with [[graft.stats.Sketches.cmsRows]]. */
object StreamCms {

  case class Inc(r: Int, bucket: Long)
  case class Cell(r: Int, bucket: Long, c: Long)

  /** Map a raw key to its depth-many (row, bucket) increments with the
    * shared deterministic hash family. */
  def incrementsOf(key: Long, width: Int): Seq[Inc] = {
    val km = math.floorMod(key, graft.stats.Sketches.cmsP)
    graft.stats.Sketches.cmsRows.zipWithIndex.map { case ((a, b), r) =>
      Inc(r, (a * km + b) % graft.stats.Sketches.cmsP % width)
    }
  }

  /** One micro-batch of a cell's arrivals: add the count, emit the new
    * cell value (Update mode: downstream keeps the latest per cell). */
  def step(cell: (Int, Long), it: Iterator[Inc],
           state: GroupState[Long]): Cell = {
    val c = state.getOption.getOrElse(0L) + it.size
    state.update(c)
    Cell(cell._1, cell._2, c)
  }

  /** Wire a stream of keys into the stateful sketch. */
  def attach(keys: Dataset[Long], width: Int): Dataset[Cell] = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.flatMap(k => incrementsOf(k, width))
      .groupByKey(i => (i.r, i.bucket))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(step)
  }
}
