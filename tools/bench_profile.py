"""Capture a jax.profiler trace of the headline bench step (B/16 bf16 b32).

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python tools/bench_profile.py [outdir]
Then: python tools/trace_top_ops.py <outdir> 30
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    except Exception:
        pass

    from bench import _build

    model = os.environ.get("BENCH_MODEL", "b16")
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    step, state, data = _build(model, batch, "bfloat16", trainable_last_k=1)

    # compile + warmup outside the trace
    state, loss = step(state, data)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, loss = step(state, data)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()
    print(f"trace written to {outdir}; loss={float(loss):.4f}")


if __name__ == "__main__":
    main()
