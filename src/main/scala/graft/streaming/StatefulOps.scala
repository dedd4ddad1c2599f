package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary-state streaming operators (SURVEY.md §2.2 "streaming" —
  * generalizing the reference's per-batch processing loop into keyed,
  * checkpointed state).
  *
  * State design for 100 TB streams: state lives in the executor-local state
  * store keyed by user, sized O(active keys) — the shuffle partitions the
  * stream once on the grouping key and every micro-batch touches only its
  * delta. Watermarks (set by the caller) bound retention.
  */
object StatefulOps {

  final case class Event(user_id: Long, event_type: String, ts: Timestamp, value: Double)
  final case class UserRunning(user_id: Long, n: Long, sum_value: Double)

  /** Per-user running (count, sum) — emitted once per micro-batch per
    * updated key (OutputMode.Update). */
  def runningPerUser(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0.0))
          var n = prev.n
          var s = prev.sum_value
          batch.foreach { e => n += 1; s += e.value }
          val next = UserRunning(user, n, s)
          state.update(next)
          next
      }
  }

  /** Output mode the runner must use for [[runningPerUser]]. */
  val runningOutputMode: OutputMode = OutputMode.Update()

  /** The same running counter on the transformWithState API (Spark 4's
    * successor to mapGroupsWithState): explicit typed state variables in the
    * StatefulProcessorHandle, per-key timers available, state evolvable
    * independently of the output type. */
  class RunningCounterProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, UserRunning] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues}

    @transient private var state: org.apache.spark.sql.streaming.ValueState[UserRunning] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[UserRunning](
        "running", Encoders.product[UserRunning], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
                                 timers: TimerValues): Iterator[UserRunning] = {
      val prev = Option(state.get()).getOrElse(UserRunning(user, 0L, 0.0))
      var n = prev.n
      var s = prev.sum_value
      rows.foreach { e => n += 1; s += e.value }
      val next = UserRunning(user, n, s)
      state.update(next)
      Iterator.single(next)
    }
  }

  /** Per-user running (count, sum) via transformWithState. */
  def runningPerUserTws(events: Dataset[Event]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningCounterProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
