"""Probe: does the persistent compilation cache work under the axon TPU
plugin at all?  Jit a tiny unique graph with min_compile_time 0 and see
whether anything lands in the cache dir; print any cache-related errors
(they are logged, not raised)."""

import logging
import os
import sys

sys.path.insert(0, "/root/repo")

from ti_raytrace_tpu.core.tpu_env import fix_stale_platform, wait_for_device

fix_stale_platform()

import jax
import jax.numpy as jnp

wait_for_device()

logging.basicConfig(level=logging.DEBUG)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

cache_dir = "/root/repo/.cache/jax"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
try:
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception as e:
    print("min_entry_size knob:", e)

x = jnp.arange(512.0 * 512).reshape(512, 512)


@jax.jit
def f(a):
    return (a @ a.T) * 3.0 + jnp.sin(a)


print("result:", float(f(x).sum()))
print("cache dir exists:", os.path.isdir(cache_dir),
      "entries:", os.listdir(cache_dir) if os.path.isdir(cache_dir) else [])
