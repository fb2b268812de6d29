"""Streaming incremental maintenance of a two-table join-aggregate
view — the continuous twin of the batch ``x_ivm_join_view`` query
(incremental.join_view_delta), in the mold of streaming/rollup.py's
continuous aggregate: each micro-batch folds its inserts into a
persisted view-state table instead of re-joining full history.

Per batch with inserts (ΔA, ΔB) the delta rule

    ΔV = ΔA ⋈ (B_old ∪ ΔB)  ∪  A_old ⋈ ΔB

touches each new join pair exactly once, so merging agg(ΔV) into the
stored view states reproduces the full recompute bit-exactly (decimal
partial sums — the x_agg_state_rollup merge contract). Both stored
sides are retained raw (the price of general two-sided IVM; Materialize
/ DBSP make the same trade) — at 100 TB they'd live join-key-bucketed
(plans/layout.py) so each delta join co-locates with a micro-batch-
sized probe side and never reshuffles history.

Exactly-once under at-least-once foreachBatch replays, with TWO
durable tables per side-pair and no transaction spanning them:

- raw appends carry a ``_batch`` stamp and happen FIRST; a replay
  whose stamp is already present skips the append (idempotent);
- the view swap is stamped with the last applied batch_id and
  short-circuits replays at-or-below it (rollup.py's recipe);
- the delta join always reads the old sides as ``_batch < batch_id``,
  so a crash BETWEEN raw append and view swap replays correctly: the
  half-appended rows are excluded from "old" and re-presented as the
  delta. Every crash point lands in exactly-once.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.batch import ParquetTable

_LAST_BATCH = "_last_batch"
_BATCH = "_batch"


class JoinViewMaintainer:
    """Maintains V = agg(A ⋈ B) under insert batches to either side.

    ``agg`` maps a joined DataFrame to mergeable partial states
    (count→sum, decimal-sum→sum …) grouped by ``keys``; every non-key
    state column is merged by SUM. Batches pass both sides as real
    (possibly empty) DataFrames so empty-side batches need no schema
    inference.
    """

    def __init__(
        self,
        a_store: ParquetTable,
        b_store: ParquetTable,
        view_store: ParquetTable,
        on,
        keys: Sequence[str],
        agg: Callable[[DataFrame], DataFrame],
    ):
        self.a_store = a_store
        self.b_store = b_store
        self.view_store = view_store
        self.on = on
        self.keys = list(keys)
        self.agg = agg

    def _merge(self, view_old: DataFrame, delta_agg: DataFrame) -> DataFrame:
        vals = [c for c in view_old.columns if c not in self.keys]
        merged = view_old.unionByName(delta_agg.select(*view_old.columns))
        return merged.groupBy(*self.keys).agg(*[F.sum(c).alias(c) for c in vals])

    def _old_side(self, store: ParquetTable, like: DataFrame, batch_id: int) -> DataFrame:
        """Stored rows durably applied BEFORE this batch (strictly
        smaller stamps — a crash-replay's own half-appended rows don't
        count as old)."""
        if not store.exists():
            return like.sparkSession.createDataFrame([], like.schema)
        return store.read().filter(F.col(_BATCH) < batch_id).drop(_BATCH)

    def _append_once(self, store: ParquetTable, delta: DataFrame, batch_id: int) -> None:
        if store.exists():
            last = store.read().agg(F.max(_BATCH)).first()[0]
            if last is not None and batch_id <= last:
                return  # replay: this batch's rows are already durable
        store.append(delta.withColumn(_BATCH, F.lit(batch_id)))

    def apply(self, da: DataFrame, db: DataFrame, batch_id: int) -> bool:
        """One maintenance step (the foreachBatch body, exposed so
        replay semantics are directly testable). Returns True iff the
        batch advanced the view; False for empty batches and replays
        of fully-applied batches."""
        a_empty, b_empty = da.isEmpty(), db.isEmpty()
        if a_empty and b_empty:
            return False

        first = not self.view_store.exists()
        if not first:
            last = self.view_store.read().agg(F.max(_LAST_BATCH)).first()[0]
            if last is not None and batch_id <= last:
                return False  # fully-applied batch replayed

        from ..incremental import join_view_delta

        a_old = self._old_side(self.a_store, da, batch_id)
        b_old = self._old_side(self.b_store, db, batch_id)

        # Phase 1 — durable, idempotent raw retention.
        if not a_empty:
            self._append_once(self.a_store, da, batch_id)
        if not b_empty:
            self._append_once(self.b_store, db, batch_id)

        # Phase 2 — stamped view merge (computed against pre-batch olds).
        delta_agg = self.agg(join_view_delta(a_old, da, b_old, db, self.on))
        if first:
            merged = delta_agg
        else:
            merged = self._merge(self.view_store.read().drop(_LAST_BATCH), delta_agg)
        self.view_store.overwrite(merged.withColumn(_LAST_BATCH, F.lit(batch_id)))
        return True

    def read_view(self) -> DataFrame:
        return self.view_store.read().drop(_LAST_BATCH)
