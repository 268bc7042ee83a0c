"""Incremental chain processing — the reference's streaming model.

Reference pattern (examples/build_tutorial05.py:21-52): per batch,
``csvimport -> dataset_type -> ... with previous=`` links, keyed in urd
by timestamp; re-running the build script processes only unseen batches
because every already-built job memo-hits.

ChainRunner packages that: feed it batch ids; for each unseen one it
builds ``step`` (memoized via BuildContext) with ``previous`` pointing at
the prior batch's output, records the result in urd, and exposes the
chain head. At 100 TB: each batch is distributed work; the driver-side
loop only touches metadata.
"""

from __future__ import annotations

from typing import Any, Callable

from ..build import BuildContext, Urd
from ..dataset import Dataset


class ChainRunner:
    def __init__(self, ctx: BuildContext, urd: Urd, listname: str):
        self.ctx = ctx
        self.urd = urd
        self.listname = listname

    def seen(self) -> set[str]:
        return {e["ts"] for e in self.urd.entries(self.listname)}

    def head(self) -> Dataset | None:
        latest = self.urd.latest(self.listname)
        return Dataset.load(latest["payload"]["dataset"]) if latest else None

    def process(
        self,
        batches: dict[str, dict[str, Any]],
        step: Callable,
    ) -> Dataset | None:
        """Process unseen batches in timestamp order.

        ``batches``: {timestamp: options} — e.g. {"2024-01-01": {"path":
        ...}}. ``step(spark, datasets, options)`` builds one batch.
        Returns the chain head dataset. Already-processed timestamps are
        skipped entirely (urd), and re-running a seen batch memo-hits
        (BuildContext) — the double idempotency the reference gets from
        urd + the job database."""
        prev = self.head()
        latest = self.urd.latest(self.listname)
        head_ts = latest["ts"] if latest else None
        seen = self.seen()  # one urd read, not one per batch
        for ts in sorted(batches):
            if ts in seen:
                continue
            if head_ts is not None and ts <= head_ts:
                # the reference urd REJECTS non-increasing timestamps
                # (urd.py: new entries must advance the list) — linking
                # an earlier batch after the head would make it
                # invisible to every chain read from head()
                raise ValueError(
                    f"batch {ts!r} is older than the chain head "
                    f"{head_ts!r}; backfills need a rebuilt chain, not "
                    "an append")
            # batch identity rides the memo key through `previous` (the
            # chain link is part of the job key) — no synthetic option
            # needed; injecting one broke steps with declared typed
            # options (resolve_options rejects unknown keys, review r4)
            job = self.ctx.build(step, options=batches[ts], previous=prev)
            prev = job.dataset()
            self.urd.add(self.listname, ts, {
                "job": job.jobid, "dataset": prev.path, "cached": job.cached,
            })
        return prev
