"""Stage protocol + ordered pipeline registry — the Ray-idiomatic
analog of the reference's user-extension surface:

- ``Stage`` ≙ the ``Pass`` API (passes/Pass.java:41-87, registered via
  TranslationConfiguration.registerPass, ordered execution at
  TranslationManager.kt:100-108): a named dataset→dataset transform
  with declared input/output columns;
- ``Pipeline`` ≙ the registered-pass list: ordered stages, validated
  column contracts, per-stage wall-time metrics (Benchmark.kt analog).

A Stage body is either a plain function (stateless Ray tasks) or a
callable class + constructor kwargs (actor pool) — mirroring X1/X2's
pass-vs-frontend split.  Unlike the reference, stages never mutate in
place: each returns a new Dataset, and the pipeline is lazy until a
consumer executes it.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class Stage:
    name: str
    fn: Callable  # plain fn OR callable class
    requires: list[str] = field(default_factory=list)  # input columns
    produces: list[str] = field(default_factory=list)  # guaranteed outputs
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: Any = None  # None = tasks; int/tuple = actor pool
    fn_constructor_kwargs: dict | None = None

    def apply(self, ds):
        kw: dict[str, Any] = {"batch_format": self.batch_format}
        if self.batch_size is not None:
            kw["batch_size"] = self.batch_size
        if isinstance(self.fn, type):
            kw["concurrency"] = self.concurrency or (1, 4)
            kw["fn_constructor_kwargs"] = self.fn_constructor_kwargs or {}
        elif self.concurrency is not None:
            kw["concurrency"] = self.concurrency
        return ds.map_batches(self.fn, **kw)


class Pipeline:
    """Ordered, validated stage list with per-stage metrics."""

    def __init__(self, stages: list[Stage] | None = None):
        self.stages: list[Stage] = []
        self.metrics: list[dict] = []
        for s in stages or []:
            self.register(s)

    def register(self, stage: Stage, *, before: str | None = None) -> "Pipeline":
        """Append (or insert before a named stage) — registerPass analog
        with explicit ordering control."""
        if any(s.name == stage.name for s in self.stages):
            raise ValueError(f"duplicate stage name {stage.name!r}")
        if before is None:
            self.stages.append(stage)
        else:
            idx = next(
                (i for i, s in enumerate(self.stages) if s.name == before), None
            )
            if idx is None:
                raise ValueError(f"unknown stage {before!r}")
            self.stages.insert(idx, stage)
        return self

    def validate(self, input_columns: list[str]) -> None:
        """Static column-contract check before any execution (the
        analog of pass-dependency ordering, caught at build time)."""
        have = set(input_columns)
        for s in self.stages:
            missing = [c for c in s.requires if c not in have]
            if missing:
                raise ValueError(
                    f"stage {s.name!r} requires columns {missing} not "
                    f"produced upstream (have {sorted(have)})"
                )
            have |= set(s.produces)

    def run(self, ds):
        """Apply all stages lazily; wall-time per stage covers graph
        construction only (execution is streaming and overlapped — the
        per-stage execution split lives in ds.stats())."""
        if self.stages:
            self.validate(list(ds.schema().names))
        for s in self.stages:
            t0 = time.monotonic()
            ds = s.apply(ds)
            self.metrics.append(
                {"stage": s.name, "build_ms": (time.monotonic() - t0) * 1e3}
            )
        return ds
