"""Characterize the in-loop row-gather floor (probe_floor.py found the
whole 1.5 ms/iter narrow-width floor is `rows[nid]` itself).

Variants, each as 16 iterations of a fori_loop whose indices depend on the
previous iteration (the traversal's serial dependency):

  g1      — one (R,) row gather from the full table
  g4      — one (4R,) row gather (frontier batching candidate)
  g2x     — two serial (R,) gathers
  onehot  — one-hot MXU contraction (R,N)@(N,72) at HIGHEST precision
  gsmall  — one (R,) gather from a 256-row table (table-size dependence)
  gnarrow — one (R,) gather of 8-wide rows (row-width dependence)

Usage: python tools/probe_gather2.py [n_table_rows] [width ...]
"""
import sys
import time

sys.path.insert(0, ".")
from pbrt_tpu.utils.jaxcfg import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps, out


def main(n_rows, widths):
    key = jax.random.PRNGKey(0)
    rows = jax.random.normal(key, (n_rows, 72), jnp.float32)
    rows_small = rows[:256]
    rows_narrow = rows[:, :8].copy()
    N = 16

    def run(kind, W):
        idx0 = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, n_rows)

        @jax.jit
        def loop(idx0):
            def body(i, carry):
                idx, acc = carry
                if kind == "g1":
                    r = rows[idx]
                elif kind == "g4":
                    i4 = jnp.concatenate([idx, (idx + 1) % n_rows,
                                          (idx + 2) % n_rows,
                                          (idx + 3) % n_rows])
                    r4 = rows[i4]
                    r = (r4[:W] + r4[W:2*W] + r4[2*W:3*W] + r4[3*W:])
                elif kind == "g2x":
                    r = rows[idx] + rows[(idx * 7 + 1) % n_rows]
                elif kind == "onehot":
                    oh = (idx[:, None] ==
                          jnp.arange(n_rows, dtype=idx.dtype)[None, :]
                          ).astype(jnp.float32)
                    r = jax.lax.dot_general(
                        oh, rows, (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)
                elif kind == "gsmall":
                    r = rows_small[idx % 256]
                elif kind == "gnarrow":
                    rn = rows_narrow[idx]
                    r = jnp.concatenate([rn] * 9, axis=1)
                acc = acc + r[:, 0]
                nxt = (idx + r[:, 1].astype(jnp.int32) % 3 + 1) % n_rows
                return nxt, acc
            idx, acc = jax.lax.fori_loop(
                0, N, body, (idx0, jnp.zeros((W,), jnp.float32)))
            return acc
        dt, _ = timeit(loop, idx0)
        print(f"N={n_rows:6d} W={W:7d} {kind:8s}: {N} iters {dt*1e3:8.1f} ms"
              f" -> {dt/N*1e3:7.3f} ms/iter", flush=True)

    for W in widths:
        for kind in ("g1", "g4", "g2x", "onehot", "gsmall", "gnarrow"):
            if kind == "onehot" and W * n_rows > 2**31:
                continue
            run(kind, W)


if __name__ == "__main__":
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3442
    widths = [int(a) for a in sys.argv[2:]] or [4096, 16384, 65536]
    main(n_rows, widths)
