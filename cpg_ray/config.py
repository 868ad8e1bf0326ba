"""DataContext tuning for the engine's workload shapes.

Callers that own a Ray session (bench.py, cli.py, tests) apply these;
library code never touches global context (same rule as ray.init).
"""

from __future__ import annotations


def tune_context(*, wide_binary: bool = False, quiet: bool = True):
    """Apply the engine's DataContext defaults.

    wide_binary=True raises the target block size so multi-MB
    html/media payload rows aren't split into absurdly small blocks
    (SURVEY.md §7.4.6); pages at our synthetic scale are a few KB, so
    the default is fine there.
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    # order is data (index/sort columns), never stream position
    ctx.execution_options.preserve_order = False
    if wide_binary:
        ctx.target_max_block_size = 256 * 1024 * 1024
    return ctx
