"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference,
first-class here).

``trace(dir)`` wraps a code region with the JAX profiler; traces open in
TensorBoard via tensorboard-plugin-profile. ``annotate(name)`` adds named
regions that show up on the trace timeline. The train CLIs expose
``--profile_dir`` (trace epoch 1 only, so compile noise from epoch 0 stays
out) and ``--debug_nans`` (jax_debug_nans: fail loudly at the op that
produced the first NaN).
"""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (usable as ctx manager)."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging():
    """Fail at the first NaN-producing op (checks every jitted output)."""
    jax.config.update("jax_debug_nans", True)
