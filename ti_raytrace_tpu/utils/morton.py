"""Morton (Z-order) codes for the LBVH builder.

Vectorized equivalents of reference UtilsFunc.py:539-580; the δ function of
Karras 2012 (common_upper_bits) is replaced by a closed-form clz, which XLA
lowers to a handful of vector ops instead of the reference's per-lane
shift loop.
"""

import jax.numpy as jnp


def expand_bits(x):
    """Interleave 10 bits -> 30 bits with 2-bit gaps
    (UtilsFunc.py:539-552, shift formulation)."""
    x = x.astype(jnp.uint32)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def morton3d(x, y, z):
    """30-bit morton code from normalized [0,1) coordinates
    (UtilsFunc.py:568-580; 1024^3 quantization, x lowest bits like the
    reference's `xx | yy<<1 | zz<<2`)."""
    qx = jnp.clip(x * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    qy = jnp.clip(y * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    qz = jnp.clip(z * 1024.0, 0.0, 1023.0).astype(jnp.uint32)
    return (expand_bits(qx) | (expand_bits(qy) << 1) | (expand_bits(qz) << 2)).astype(
        jnp.uint32
    )


def clz32(x):
    """Count leading zeros of a uint32, branch-free."""
    return (32 - _bit_width(x.astype(jnp.uint32))).astype(jnp.int32)


def _bit_width(x):
    """Position of highest set bit (0 for x==0) via float exponent trick is
    unsafe for >24 bits; use a 5-step binary reduction instead."""
    x = x.astype(jnp.uint32)
    n = jnp.zeros_like(x, dtype=jnp.int32)
    for shift in (16, 8, 4, 2, 1):
        has = (x >> shift) > 0
        n = n + jnp.where(has, shift, 0)
        x = jnp.where(has, x >> shift, x)
    return n + (x > 0).astype(jnp.int32)


def common_upper_bits(a, b):
    """Number of common leading bits of two 32-bit codes — Karras's δ
    (UtilsFunc.py:556-566)."""
    return clz32(jnp.bitwise_xor(a.astype(jnp.uint32), b.astype(jnp.uint32)))
