"""Profiling hooks: jax.profiler integration (SURVEY.md §5 rebuild item).

Wraps step regions in named TraceAnnotations so XProf/Perfetto traces show
the SVGD phases, and provides a one-call trace capture around a block of
steps."""

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace for everything inside the block:

        with profiling.trace("/tmp/svgd-trace"):
            for _ in range(20):
                sampler.train_on_batch(batch)

    View with XProf / TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace annotation context (shows as a labelled span)."""
    return jax.profiler.TraceAnnotation(name)
