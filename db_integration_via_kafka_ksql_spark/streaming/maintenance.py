"""Scheduled maintenance for epochdir-backed streaming stages.

r13 verdict #5: every store had the right primitives —
`epochdir.compact_epochs` (merge old output epochs into one file set),
`epochdir.prune_state_epochs` (strip superseded latest-before state
copies), `expire_witnesses` / `ParquetStateStore.prune_below` (TTL) —
but NOTHING scheduled them on a long-lived stream, so a week of
2-second triggers meant ~300k state copies and ~300k output partitions
per stage. This module is the one policy knob and the cadence that
runs those primitives from inside `process_batch`, after the epoch's
own commits.

Design constraints the cadence honors:

- **runs only after a FRESH commit** (never on a replay skip): a replay
  must stay a byte-level no-op;
- **cadence by epoch id** (`epoch_id % every_n_epochs == 0`), so the
  schedule is deterministic and restart-safe — no wall clock, no
  counters outside the checkpoint;
- **maintenance never changes reader-visible ROWS**: state pruning
  keeps `keep_last` full copies (readers use latest-before), output
  compaction merges data losslessly (`compact_epochs`' contract),
  witness TTL is the documented re-admission trade the caller opted
  into by setting a TTL. Part NAMES are another matter — compaction
  rewrites old epochs as fresh part files, so `compact_outputs` must
  NEVER be enabled on a dataset tailed by a file-name-tracking
  downstream source (it would re-ingest every compacted row — the
  at-least-once hole epochdir closed), and its publish/strip window is
  not safe under a concurrently SCANNING batch reader
  (`compact_epochs`' maintenance-window contract): enable it only on
  datasets whose readers are quiescent at the cadence ticks. It
  defaults off for exactly these reasons;
- **failure isolation**: a maintenance error must not fail the batch —
  the data commits already happened; the pass logs and retries at the
  next cadence tick (each primitive is idempotent / crash-resumable).

Wiring: stages with a latest-before state dir take
`maintenance=MaintenancePolicy(...)` and call `maintain()` at the end
of a fresh `process_batch`. Witness-store stages (near-dup, semdedup,
fingerprint pairs) use `witness_ttl_epochs` to schedule their own
`expire_witnesses`.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass

from db_integration_via_kafka_ksql_spark.streaming import epochdir


@dataclass(frozen=True)
class MaintenancePolicy:
    """One knob per concern; None disables that concern."""

    every_n_epochs: int = 16           # cadence (epoch_id % n == 0)
    state_keep_last: int = 2           # latest-before state copies kept
    # merge old output epochs — NEVER on datasets tailed by a
    # file-name-tracking source, and only where readers are quiescent at
    # the cadence ticks (see module docstring)
    compact_outputs: bool = False
    output_keep_last: int = 4          # ...keeping the last K uncompacted
    witness_ttl_epochs: int | None = None  # expire_witnesses horizon

    def __post_init__(self) -> None:
        if self.every_n_epochs < 1:
            raise ValueError("every_n_epochs must be >= 1")
        if self.state_keep_last < 1:
            raise ValueError("state_keep_last must be >= 1")
        if self.output_keep_last < 1:
            raise ValueError("output_keep_last must be >= 1")
        if self.witness_ttl_epochs is not None and self.witness_ttl_epochs < 1:
            # ttl=0 would expire THIS epoch's witnesses every tick —
            # silently disabling cross-batch dedup with no error
            raise ValueError("witness_ttl_epochs must be >= 1 (or None)")

    def due(self, epoch_id: int) -> bool:
        return epoch_id % self.every_n_epochs == 0


def maintain(
    spark,
    policy: MaintenancePolicy | None,
    epoch_id: int,
    batch_col: str,
    state_paths: tuple[str, ...] = (),
    output_paths: tuple[str, ...] = (),
    expire=None,
) -> dict | None:
    """Run the policy's due maintenance for one stage. Returns the pass
    report, or None when no policy is set / the tick isn't due. Errors
    are downgraded to a RuntimeWarning — the batch's own commits are
    already durable and every primitive retries cleanly next tick."""
    if policy is None or not policy.due(epoch_id):
        return None
    report: dict = {"epoch": epoch_id}
    try:
        for p in state_paths:
            if epochdir.list_epochs(p, batch_col):
                r = epochdir.prune_state_epochs(
                    p, batch_col, keep_last=policy.state_keep_last
                )
                report[f"state:{p}"] = r["pruned_epochs"]
        if policy.compact_outputs:
            for p in output_paths:
                epochs = epochdir.list_epochs(p, batch_col)
                cut = (
                    epochs[-policy.output_keep_last - 1]
                    if len(epochs) > policy.output_keep_last
                    else None
                )
                if cut is not None:
                    r = epochdir.compact_epochs(spark, p, batch_col, cut)
                    report[f"output:{p}"] = r["compacted_epochs"]
        if policy.witness_ttl_epochs is not None and expire is not None:
            horizon = epoch_id - policy.witness_ttl_epochs
            if horizon > 0:
                report["expired"] = expire(horizon)
    except Exception as e:  # noqa: BLE001 — isolation is the contract
        warnings.warn(
            f"epochdir maintenance failed at epoch {epoch_id} "
            f"(will retry next tick): {e!r}",
            RuntimeWarning,
            stacklevel=2,
        )
        report["error"] = repr(e)[:200]
    return report
