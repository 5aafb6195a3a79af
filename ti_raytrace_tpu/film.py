"""Progressive film: accumulation, tone mapping, checkpoint/resume.

The accumulation state (hdr, frame, rng key) is a pytree, which gives the
preemption-safe progressive rendering the reference lacks (SURVEY.md §5.4):
serialize it any time, reload, and continue bit-identically.
"""

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ti_raytrace_tpu.io.image import film_to_image, write_png
from ti_raytrace_tpu.utils.colorsp import tone_map


class Film(NamedTuple):
    hdr: jnp.ndarray    # (W, H, 3) running mean radiance
    frame: jnp.ndarray  # () int32, frames accumulated so far
    key: jnp.ndarray    # jax PRNG key for the *next* frame


def new_film(width: int, height: int, seed: int = 0) -> Film:
    return Film(
        hdr=jnp.zeros((width, height, 3), jnp.float32),
        frame=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(seed),
    )


def accumulate(film: Film, radiance: jnp.ndarray) -> Film:
    """Progressive exponential average with coff = 1/(frame+1)
    (reference PT_RGB.py:134-136) — an exact running mean."""
    coff = 1.0 / (film.frame.astype(jnp.float32) + 1.0)
    hdr = radiance * coff + film.hdr * (1.0 - coff)
    key, _ = jax.random.split(film.key)
    return Film(hdr=hdr, frame=film.frame + 1, key=key)


def accumulate_group(film: Film, radiance_sum: jnp.ndarray, n: int) -> Film:
    """Fold n frames' SUMMED radiance into the running mean in one step.

    Exactly n accumulate() calls in exact arithmetic:
    mean' = (mean*frame + sum)/(frame+n).  The key advances by the same
    n splits, so a group render stays on the film's per-frame key chain
    (frame f's key is identical whether frames arrive one by one or in
    groups — checkpoints remain interchangeable between the two modes)."""
    f = film.frame.astype(jnp.float32)
    hdr = (film.hdr * f + radiance_sum) / (f + n)
    key = film.key
    for _ in range(n):
        key, _ = jax.random.split(key)
    return Film(hdr=hdr, frame=film.frame + n, key=key)


def to_srgb(film: Film, exposure: float = 0.5) -> jnp.ndarray:
    """Tone-mapped (W, H, 3) sRGB film (reference Example.py:43)."""
    return tone_map(film.hdr, exposure)


def save_png(film: Film, path: str, exposure: float = 0.5) -> None:
    write_png(path, film_to_image(np.asarray(to_srgb(film, exposure))))


def save_checkpoint(film: Film, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path,
        hdr=np.asarray(film.hdr),
        frame=np.asarray(film.frame),
        key=np.asarray(jax.random.key_data(film.key)),
    )


def load_checkpoint(path: str) -> Film:
    z = np.load(path if path.endswith(".npz") else path + ".npz")
    return Film(
        hdr=jnp.asarray(z["hdr"]),
        frame=jnp.asarray(z["frame"], jnp.int32),
        key=jax.random.wrap_key_data(jnp.asarray(z["key"])),
    )
