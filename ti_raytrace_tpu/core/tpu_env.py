"""TPU environment hardening for this machine's tunneled-TPU plugin.

The container reaches one TPU v5e through a PJRT plugin registered by a
sitecustomize (found via ``PYTHONPATH=/root/.axon_site``).  Two failure
modes need defending at every entry point (bench.py, the CLI, scripts):

* the environment still pins ``JAX_PLATFORMS=axon`` — a stale platform
  name the plugin no longer registers (it registers as ``tpu``); jax
  then aborts with "Backend 'axon' is not in the list of known
  backends".  ``fix_stale_platform()`` rewrites exactly that value to
  ``tpu`` (a loud-failure choice: an empty value silently falls back to
  CPU when the device is briefly unavailable, and the pallas kernels
  then die with "Only interpret mode is supported on CPU backend").
* a previously killed process holds the device grant for ~1-2 minutes;
  init then raises "No jellyfish device found".  ``wait_for_device()``
  retries initialization until the grant frees.

Call ``fix_stale_platform()`` BEFORE the first ``import jax``.
"""

import os
import sys
import time


def fix_stale_platform() -> None:
    if os.environ.get("JAX_PLATFORMS") == "axon":
        os.environ["JAX_PLATFORMS"] = "tpu"


def wait_for_device(max_wait_s: float = 240.0, interval_s: float = 15.0):
    """Initialize the default jax backend, retrying while a lingering
    grant from a killed process frees up.  Returns jax.devices()."""
    import jax

    deadline = time.time() + max_wait_s
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:  # backend init failure
            if time.time() >= deadline:
                raise
            print(
                f"TPU init failed ({e}); retrying in {interval_s:.0f}s",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(interval_s)
