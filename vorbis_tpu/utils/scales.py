"""Scale conversions: dB, Bark, octave (reference: lib/scales.h).

todB is the IEEE-754 bit-cast linear approximation — NOT 20log10 — and
is load-bearing for the psy tunings (the .345 dB correction hack in
mapping0.c exists because of its known bias).  It must be reproduced
exactly: reinterpret |x| as uint32, then float32(u * 7.17711438e-7f -
764.6161886f).
"""

from __future__ import annotations

import numpy as np

_TODB_SCALE = np.float32(7.17711438e-7)
_TODB_BIAS = np.float32(764.6161886)
DB345 = np.float32(0.345)


def todB(x, xp=np):
    """Vectorized bit-cast 20log10 approximation, float32-exact."""
    xi = xp.abs(x).view(np.uint32) if xp is np else None
    if xp is np:
        u = (np.asarray(x, dtype=np.float32).view(np.uint32)
             & np.uint32(0x7FFFFFFF))
        return u.astype(np.float32) * _TODB_SCALE - _TODB_BIAS
    # jax path
    import jax.numpy as jnp
    u = jnp.bitwise_and(jax_bitcast_u32(x, xp), jnp.uint32(0x7FFFFFFF))
    return u.astype(jnp.float32) * _TODB_SCALE - _TODB_BIAS


def jax_bitcast_u32(x, jnp):
    return jnp.asarray(x, dtype=jnp.float32).view(jnp.uint32)


def unitnorm(x, xp=np):
    """+-1 with the sign of x (bit trick: sign bit | 1.0f)."""
    if xp is np:
        u = np.asarray(x, dtype=np.float32).view(np.uint32)
        return ((u & np.uint32(0x80000000)) | np.uint32(0x3F800000)).view(
            np.float32)
    import jax.numpy as jnp
    u = jnp.asarray(x, dtype=jnp.float32).view(jnp.uint32)
    return jnp.bitwise_or(jnp.bitwise_and(u, jnp.uint32(0x80000000)),
                          jnp.uint32(0x3F800000)).view(jnp.float32)


# Init-time scalar versions (double math then use; match C promotion)
def toBARK(n: float) -> float:
    import math
    return (13.1 * math.atan(0.00074 * n)
            + 2.24 * math.atan(n * n * 1.85e-8) + 1e-4 * n)


def fromBARK(z: float) -> float:
    return 102.0 * z - 2.0 * z ** 2 + 0.4 * z ** 3 + 1.46 ** z - 1.0


def toOC(n: float) -> float:
    import math
    return math.log(n) * 1.442695 - 5.965784


def fromOC(o: float) -> float:
    import math
    return math.exp((o + 5.965784) * 0.693147)


def fromdB(x: float) -> float:
    import math
    return math.exp(x * 0.11512925)
