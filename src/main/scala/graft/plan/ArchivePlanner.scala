package graft.plan

import graft.config.ArchiverConfig
import graft.source.TableSource

/** Per-table physical plan for one archive run: either a key-split
  * predicate array (parallel) or a sequential time-window list — the
  * worker's plan choice (worker/worker.go:86-174) as a pure value.
  */
sealed trait ArchivePlan
final case class KeySplitPlan(predicates: Seq[String], batch: BigInt,
    min: BigInt, max: BigInt) extends ArchivePlan
final case class TimeSplitPlan(windows: Seq[String]) extends ArchivePlan
case object EmptyTablePlan extends ArchivePlan

object ArchivePlanner {

  /** Plan one (db, table): issue the planning aggregates through the
    * source, adapt the batch size to key density, then synthesize the
    * predicate set. */
  def plan(src: TableSource, cfg: ArchiverConfig, db: String, table: String): ArchivePlan =
    if (cfg.sourceSplitKey.nonEmpty) {
      val (mn, mx) = src.minMaxKey(db, table, cfg.sourceSplitKey, cfg.sourceWhereCondition)
      if (mn == 0 && mx == 0) EmptyTablePlan // reference empty-table sentinel
      else {
        val cnt = BigInt(src.count(db, table, cfg.sourceWhereCondition))
        val batch = SplitPlanner.adjustBatchSize(mn, mx, cnt, cfg.batchSize)
        KeySplitPlan(
          SplitPlanner.keySplitPredicates(cfg.sourceSplitKey, batch, mn, mx, cfg.maxThread),
          batch, mn, mx)
      }
    } else {
      val (mnT, mxT) = src.minMaxTime(db, table, cfg.sourceSplitTimeKey, cfg.sourceWhereCondition)
      if (mnT.isEmpty || mxT.isEmpty) EmptyTablePlan
      else TimeSplitPlan(
        SplitPlanner.timeWindows(cfg.sourceSplitTimeKey, cfg.timeSplitUnit, mnT, mxT,
            quote = src.timestampLiteral)
          .fold(e => throw new IllegalArgumentException(e.getMessage), identity))
    }
}
