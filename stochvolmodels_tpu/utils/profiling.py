"""
Profiling/tracing utilities (SURVEY.md §5): the reference's only tracing is
a wall-clock ``@timer`` decorator (utils/funcs.py:62-75, mirrored in
stochvolmodels_tpu.utils.funcs).  On TPU the structured counterpart is an XLA
profiler trace viewable in TensorBoard / Perfetto, plus named regions so the
pricing stages show up in the timeline.
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None,
                 create_perfetto_link: bool = False) -> Iterator[str]:
    """capture an XLA device trace around the body.

    >>> with device_trace("/tmp/svmtpu_trace"):
    ...     pricer.price_chain(option_chain=chain, params=params)

    View with ``tensorboard --logdir <dir>`` (profile plugin) or upload the
    .perfetto-trace to ui.perfetto.dev.
    """
    trace_dir = trace_dir or os.path.join("/tmp", f"svmtpu_trace_{int(time.time())}")
    jax.profiler.start_trace(trace_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """named region for the profiler timeline (TraceAnnotation).

    Usable as decorator or context manager:

    >>> with annotate("fourier_inversion"):
    ...     prices = vanilla_prices_with_mgf_grid(...)
    """
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def wall_and_device_time() -> Iterator[dict]:
    """measure wall-clock around a device computation; the caller must force
    completion inside the body (fetch a scalar to host — block_until_ready
    does not reliably block through remote-device tunnels)."""
    out = {}
    t0 = time.perf_counter()
    try:
        yield out
    finally:
        out["wall_s"] = time.perf_counter() - t0
