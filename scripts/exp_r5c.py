"""Microbench the flush scatter-add layouts.  The deep flush
`rad.at[:, pix].add(u)` at (3, 4M) accum / 1M updates costs ~42 ms per
merged group (fusion.813, scripts/exp_r5a.py trace) — 2.6 ms/frame.
Lane-axis gathers of planar arrays are the known-slow kind; test whether
the scatter shares that asymmetry:

  planar   : (3, 4M).at[:, pix].add((3, 1M))        — production
  rowmajor : (4M, 3).at[pix, :].add((1M, 3))        — sublane-axis
  rowmaj8  : (4M, 8).at[pix, :].add((1M, 8))        — padded to sublane
  transposed: swapaxes around the rowmajor scatter   — conversion cost
  sortedidx: planar with ascending ids               — locality effect

64 dependent scatters inside one jit (loop-carried accum) so the ~30 ms
tunnel floor amortizes; per-op cost = total / 64.

    python scripts/exp_r5c.py
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax

wait_for_device()

import jax.numpy as jnp
import numpy as np

ACC = 4 * 1024 * 1024
UPD = 1024 * 1024
REPS = 16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(fn, a, *args):
    # feed the output back as the accumulator: the axon tunnel CACHES
    # identical dispatches, so repeated same-input calls return instantly
    def g(a, *rest):
        a = fn(a, *rest)
        return a, a[:, 0].sum() if a.shape[0] < a.shape[1] else a[0, :].sum()
    f = jax.jit(g, donate_argnums=(0,))
    a, s = f(a, *args)
    float(s)  # host fetch: forces real execution through the tunnel
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        a, s = f(a, *args)
        float(s)
        times.append(time.perf_counter() - t0)
    tot = sorted(times)[len(times) // 2]
    log(f'      total {tot*1e3:.2f} ms')
    return tot / REPS * 1e3


def main():
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.choice(ACC, size=UPD, replace=False).astype(np.int32))
    pix_sorted = jnp.sort(pix)
    u3 = jnp.asarray(rng.standard_normal((3, UPD), dtype=np.float32))

    def planar(a, u, ids):
        def body(i, a):
            return a.at[:, ids].add(u * (1.0 + jnp.float32(i)))
        return jax.lax.fori_loop(0, REPS, body, a)

    def rowmajor(a, u, ids):
        def body(i, a):
            return a.at[ids, :].add(u * (1.0 + jnp.float32(i)))
        return jax.lax.fori_loop(0, REPS, body, a)

    def transposed(a, u, ids):
        # planar accum + planar updates, scatter through swapaxes
        def body(i, a):
            at = jnp.swapaxes(a, 0, 1).at[ids, :].add(
                jnp.swapaxes(u * (1.0 + jnp.float32(i)), 0, 1))
            return jnp.swapaxes(at, 0, 1)
        return jax.lax.fori_loop(0, REPS, body, a)

    a3 = jnp.zeros((3, ACC), jnp.float32)
    a3r = jnp.zeros((ACC, 3), jnp.float32)
    a8r = jnp.zeros((ACC, 8), jnp.float32)
    u3r = jnp.swapaxes(u3, 0, 1)
    u8r = jnp.concatenate([u3r, jnp.zeros((UPD, 5), jnp.float32)], 1)

    log(f"planar   (3,4M)@1M : {bench(planar, a3, u3, pix):7.3f} ms/op")
    log(f"rowmajor (4M,3)@1M : {bench(rowmajor, a3r, u3r, pix):7.3f} ms/op")
    log(f"rowmaj8  (4M,8)@1M : {bench(rowmajor, a8r, u8r, pix):7.3f} ms/op")
    a3b = jnp.zeros((3, ACC), jnp.float32)
    log(f"transposed         : {bench(transposed, a3b, u3, pix):7.3f} ms/op")
    a3c = jnp.zeros((3, ACC), jnp.float32)
    log(f"planar sorted ids  : {bench(planar, a3c, u3, pix_sorted):7.3f} ms/op")
    a3d = jnp.zeros((ACC, 3), jnp.float32)
    log(f"rowmajor sorted ids: {bench(rowmajor, a3d, u3r, pix_sorted):7.3f} ms/op")


if __name__ == "__main__":
    main()
