"""Profiling plane: JAX/Perfetto traces + named phase annotation.

The reference's only profiling is the per-solve wall time and KKT residual
it reads back from acados (acados_mpc.cpp:614-616) plus rqt_plot.  The TPU
equivalent (SURVEY.md §5) is the XLA profiler: device traces with named
ranges for the solver phases, viewable in Perfetto / TensorBoard.

Usage:
    with trace("/tmp/nmpc_trace"):
        for _ in range(20):
            states, outs = step(states, x0s)
        jax.block_until_ready(outs.u0)
    # -> load the printed directory in ui.perfetto.dev or TensorBoard

    with phase("rti-prepare"):      # named range inside a trace
        qp = prepare(...)

`phase` also works under jit tracing (it wraps
jax.named_scope + jax.profiler.TraceAnnotation) so kernel names carry the
phase label in the device timeline.
"""

from __future__ import annotations

import contextlib
import glob
import os

import jax


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a device+host profiler trace into `log_dir`.

    Remember to `jax.block_until_ready` the last output inside the context
    — async dispatch otherwise leaks work past the trace end.
    """
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def phase(name: str):
    """Named range: shows up in the trace timeline AND in XLA op names
    (under jit, via named_scope) so fused kernels are attributable."""
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield


def trace_files(log_dir: str):
    """The .xplane.pb / perfetto trace artifacts under a trace dir."""
    return sorted(
        glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                  recursive=True)
        + glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                    recursive=True))
