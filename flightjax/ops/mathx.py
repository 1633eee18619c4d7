"""Mosaic-safe transcendentals + a tracing context that swaps them in.

The Pallas TPU lowering (Mosaic) has no primitives for `atan/atan2/asin/
acos` (verified: KernelType.TC rejects `atan2`). The flight physics uses
them throughout (airflow angles, azimuth/course, quaternion <-> Euler), so
the whole-step megakernel substitutes composition-based implementations at
trace time: `mosaic_safe()` monkeypatches the jnp entry points while the
kernel jaxpr is being built, leaving every other caller untouched.

atan core: the classic single-precision Cephes `atanf` kernel — branch-free
two-stage range reduction (x > tan(3pi/8) -> pi/2 - atan(1/x);
x > tan(pi/8) -> pi/4 + atan((x-1)/(x+1))) and a degree-7 odd minimax
polynomial, ~1 ulp f32 accuracy.
"""

import contextlib

import jax.numpy as jnp
import numpy as np

_TAN3PI8 = 2.414213562373095   # tan(3*pi/8)
_TANPI8 = 0.4142135623730950   # tan(pi/8)


def atan(x):
    """Mosaic-safe arctangent (elementwise, Cephes atanf kernel)."""
    ax = jnp.abs(x)
    hi = ax > _TAN3PI8
    mid = jnp.logical_and(~hi, ax > _TANPI8)
    # reduced argument and additive constant per range
    safe = jnp.maximum(ax, 1e-30)
    z = jnp.where(hi, -1.0 / safe,
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    bias = jnp.where(hi, np.pi / 2, jnp.where(mid, np.pi / 4, 0.0))
    zz = z * z
    p = (((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
          + 1.99777106478e-1) * zz - 3.33329491539e-1) * zz * z + z
    return jnp.sign(x) * (bias + p)


def atan2(y, x):
    """Mosaic-safe four-quadrant arctangent (elementwise)."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = atan(y / safe_x)
    r = jnp.where(x > 0.0, base,
                  jnp.where(y >= 0.0, base + np.pi, base - np.pi))
    # x == 0: +-pi/2 by the sign of y (0 if both zero, matching XLA atan2's
    # finite behavior closely enough for physics use)
    r = jnp.where(x == 0.0,
                  jnp.where(y > 0.0, np.pi / 2,
                            jnp.where(y < 0.0, -np.pi / 2, 0.0)), r)
    return r


def asin(x):
    xc = jnp.clip(x, -1.0, 1.0)
    return atan2(xc, jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)))


def acos(x):
    return np.pi / 2 - asin(x)


@contextlib.contextmanager
def mosaic_safe():
    """Patch jnp's inverse-trig entry points with the Mosaic-safe versions
    for the duration of a trace, and switch dense table interpolation to
    its reshape-free kron-matmul form (Mosaic rejects minor-dim reshapes;
    see ops.interp._KRON_STATIC)."""
    from flightjax.ops import interp
    saved = (jnp.arctan, jnp.arctan2, jnp.arcsin, jnp.arccos)
    saved_kron = interp._KRON_STATIC
    jnp.arctan, jnp.arctan2, jnp.arcsin, jnp.arccos = atan, atan2, asin, acos
    interp._KRON_STATIC = True
    try:
        yield
    finally:
        (jnp.arctan, jnp.arctan2, jnp.arcsin, jnp.arccos) = saved
        interp._KRON_STATIC = saved_kron
