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


# Init-time scalar versions.  The C macros use f-suffixed float
# constants promoted into double expressions (scales.h); reproduce the
# float32-rounded constant values exactly.
_C = lambda v: float(np.float32(v))


def toBARK(n) -> float:
    """C macro semantics: with an integer argument, each atan argument
    is a float-const*int product computed (and rounded) in float32;
    the atans and the final sum are double."""
    import math
    if isinstance(n, (int, np.integer)):
        # float-const * int: the int converts to float32 first, then a
        # single-precision multiply
        nf = np.float32(int(n))
        a1 = float(np.float32(0.00074) * nf)
        a2 = float(np.float32(np.float32(int(n) * int(n)))
                   * np.float32(1.85e-8))
        a3 = float(np.float32(1e-4) * nf)
        return (_C(13.1) * math.atan(a1) + _C(2.24) * math.atan(a2) + a3)
    return (_C(13.1) * math.atan(_C(0.00074) * n)
            + _C(2.24) * math.atan(n * n * _C(1.85e-8)) + _C(1e-4) * n)


def fromBARK(z: float) -> float:
    return (_C(102.0) * z - _C(2.0) * z ** 2 + _C(0.4) * z ** 3
            + _C(1.46) ** z - _C(1.0))


def toOC(n: float) -> float:
    import math
    return math.log(n) * _C(1.442695) - _C(5.965784)


def fromOC(o: float) -> float:
    import math
    return math.exp((o + _C(5.965784)) * _C(0.693147))


def fromdB(x: float) -> float:
    import math
    return math.exp(x * _C(0.11512925))
