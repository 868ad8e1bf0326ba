"""Runtime-registered consumer checks over a translated graph — the
console ``:run`` orchestration analog (reference: cpg-console's
RunPlugin executes registered Plugin implementations discovered at
runtime over the loaded graph; SURVEY §2 X6/M12).  Third-party checks
are plain Python files dropped into a plugin directory: each module
exposes ``register(registry)`` and is discovered + loaded at RUN time,
no install step — the registry is the extension seam.

Execution contract: a check receives a :class:`CheckContext` with lazy
Dataset views of the graph tables and returns ``(ok, detail)``.  A
check that RAISES is reported as a failed row (error captured), never
aborts the sweep — a third-party plugin must not take down the run.

Scale shape: checks run sequentially on the driver but each check body
is expected to be a Dataset aggregate/filter (the built-ins are), so
the heavy lifting streams through Ray Data; the registry itself holds
only callables.
"""

from __future__ import annotations

import glob
import importlib.util
import os
import traceback
from collections.abc import Callable
from dataclasses import dataclass, field

import pandas as pd


@dataclass
class CheckContext:
    """Lazy views over a translate output dir."""

    graph_dir: str

    def _read(self, pattern: str, columns=None):
        import ray.data as rd

        files = sorted(glob.glob(os.path.join(self.graph_dir, pattern)))
        if not files:
            raise FileNotFoundError(
                f"no files match {pattern!r} under {self.graph_dir}")
        return rd.read_parquet(files, columns=columns)

    def nodes(self, columns=None):
        return self._read("graph/shard=*/kind=node/*.parquet", columns)

    def edges(self, columns=None):
        return self._read("graph/shard=*/kind=edge/*.parquet", columns)

    def triples(self, columns=None):
        return self._read("triples/shard=*/*.parquet", columns)


@dataclass
class CheckRegistry:
    """Named check callables; third-party modules add theirs via
    ``register(registry)`` at discovery time (RunPlugin analog)."""

    checks: dict[str, Callable] = field(default_factory=dict)
    sources: dict[str, str] = field(default_factory=dict)

    def add(self, name: str, fn: Callable, *, source: str = "builtin"):
        if name in self.checks:
            raise ValueError(f"duplicate check name {name!r} "
                             f"(already from {self.sources[name]})")
        self.checks[name] = fn
        self.sources[name] = source
        return self

    def discover(self, plugin_dir: str) -> list[str]:
        """Load every ``*.py`` in ``plugin_dir`` and call its
        ``register(registry)`` hook.  Returns the module paths loaded.
        A module that fails to import or register is recorded as an
        always-failing check (the error must surface in the report,
        not crash discovery)."""
        loaded = []
        for path in sorted(glob.glob(os.path.join(plugin_dir, "*.py"))):
            mod_name = f"cpg_check_{os.path.splitext(os.path.basename(path))[0]}"
            try:
                spec = importlib.util.spec_from_file_location(mod_name, path)
                mod = importlib.util.module_from_spec(spec)
                spec.loader.exec_module(mod)
                reg_fn = getattr(mod, "register", None)
                if reg_fn is None:
                    raise AttributeError(
                        f"{path} defines no register(registry) hook")
                reg_fn(self)
                loaded.append(path)
            except Exception as exc:  # noqa: BLE001 — report, don't crash
                err = f"{type(exc).__name__}: {exc}"
                self.add(
                    f"load:{os.path.basename(path)}",
                    lambda ctx, _e=err: (False, f"plugin load failed: {_e}"),
                    source=path,
                )
        return loaded

    def run(self, graph_dir: str) -> pd.DataFrame:
        """Execute every registered check; exceptions become failed
        rows with the traceback's last line as detail."""
        ctx = CheckContext(graph_dir)
        rows = []
        for name in sorted(self.checks):
            try:
                ok, detail = self.checks[name](ctx)
            except Exception:  # noqa: BLE001 — a check must not abort the sweep
                ok = False
                detail = traceback.format_exc().strip().splitlines()[-1]
            rows.append({"check": name, "source": self.sources[name],
                         "ok": bool(ok), "detail": str(detail)})
        return pd.DataFrame(rows, columns=["check", "source", "ok",
                                           "detail"])


# ---- built-in checks (M12 consumer checks as registry entries) -------------


def _check_triples_nonempty(ctx: CheckContext):
    n = ctx.triples(columns=["pred"]).count()
    return n > 0, f"{n} triples"


def _check_no_dangling_edges(ctx: CheckContext):
    """Every edge endpoint resolves to a node (the kg_dangling_edges
    invariant, run as a consumer check)."""
    from cpg_ray.functions.graphquery import dangling_edges

    bad = dangling_edges(ctx.nodes(columns=["node_id"]),
                         ctx.edges(columns=["src_id", "dst_id", "etype",
                                            "url"]))
    n = bad.count()
    return n == 0, f"{n} dangling edges"


def _check_triple_schema(ctx: CheckContext):
    want = {"canonical_subj", "pred", "canonical_obj", "url",
            "span_start"}
    have = set(ctx.triples().schema().names)
    missing = sorted(want - have)
    return not missing, ("schema ok" if not missing
                         else f"missing columns: {missing}")


def default_registry() -> CheckRegistry:
    reg = CheckRegistry()
    reg.add("triples_nonempty", _check_triples_nonempty)
    reg.add("no_dangling_edges", _check_no_dangling_edges)
    reg.add("triple_schema", _check_triple_schema)
    return reg
