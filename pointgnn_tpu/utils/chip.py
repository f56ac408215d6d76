"""Chip-state probe shared by bench.py and tools/profile_inference.py.

The tunneled v5e's wall clock is bistable across processes (up to 4x —
docs/PERF_NOTES.md "Measure in ONE process").  This large-matmul rate
probe stamps every measurement run with the state it drew; the
documented thresholds (healthy >= 100 TF/s, < 50 degraded) only mean
anything if every tool runs the SAME probe, hence one implementation.
"""

import time

__all__ = ["matmul_probe_tflops"]


def matmul_probe_tflops(n: int = 4096, reps: int = 10) -> float:
    """bf16 [n, n] matmul chain rate in TF/s (one warm rep timed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(x):
        for _ in range(reps):
            x = jnp.dot(x, x, preferred_element_type=jnp.bfloat16)
            x = (x * 1e-9).astype(jnp.bfloat16)
        return jnp.float32(x[0, 0])

    float(np.asarray(chain(a)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(chain(a)))
    return 2.0 * n ** 3 * reps / (time.perf_counter() - t0) / 1e12
