"""Control-law primitives: PI (continuous), Integrator / LeadLag / PID / LQR
(discrete), plus gain-schedule infrastructure.

Mirrors `/root/reference/lib/FlightPhysics/src/control.jl`:
- `PIVector` continuous PI with anti-windup via external+internal saturation
  flags and integrator leak (`control.jl:11-88`)
- discrete `Integrator` with halt-on-saturation (`:123-255`)
- `LeadLag` Tustin-discretized (`:288-346`)
- gain-schedulable `PID` (backward-Euler integral, filtered derivative with
  alpha = 1/(tau_f + dt) — `:370-579`)
- `LQR` steady-state tracker
  u = u_trim + K_fwd (z_ref - z_trim) - K_fbk (x - x_trim) + int(K_int (z_ref - z))
  with output clamping and integrator halt (`:620-743`)

Unlike the reference's mutable Models, these are **pure step functions**
over (params, state) NamedTuples. Gains are part of `params`, so gain
scheduling is just building params from table lookups every step — the
functional equivalent of the reference's `assign!(mdl, lookup(EAS, h))`
(`control.jl:832-848`). Everything broadcasts: a "vector PID" is the scalar
PID with array-shaped leaves.

Anti-windup convention (reference `control.jl:74,448,728`): integration
halts when the integrator input pushes further into a saturated region,
where saturation is signalled by the previous output saturation status
and/or an external downstream saturation signal (both in {-1, 0, +1}).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

INF = float("inf")


def saturation_status(out_free, lo, hi):
    """Signed saturation: +1 at/above hi, -1 at/below lo, else 0."""
    return ((out_free >= hi).astype(jnp.int32)
            - (out_free <= lo).astype(jnp.int32))


def _halted(u_i, sat_out_0, sat_ext):
    return jnp.logical_or(jnp.sign(u_i * sat_out_0) > 0,
                          jnp.sign(u_i * sat_ext) > 0)


# ------------------------------------------------------------ continuous PI

class PIParams(NamedTuple):
    k_p: jnp.ndarray
    k_i: jnp.ndarray
    k_l: jnp.ndarray        # integrator leak
    beta_p: jnp.ndarray     # proportional reference weighting
    bound_lo: jnp.ndarray
    bound_hi: jnp.ndarray


def pi_params(n=None, k_p=1.0, k_i=0.0, k_l=0.0, beta_p=1.0,
              bound_lo=-INF, bound_hi=INF):
    def arr(v):
        v = jnp.asarray(v, dtype=float)
        return jnp.broadcast_to(v, (n,)) if n is not None and v.ndim == 0 else v
    return PIParams(arr(k_p), arr(k_i), arr(k_l), arr(beta_p),
                    arr(bound_lo), arr(bound_hi))


class PIOutput(NamedTuple):
    y_p: jnp.ndarray
    y_i: jnp.ndarray
    out_free: jnp.ndarray
    sat_out: jnp.ndarray
    output: jnp.ndarray
    int_halted: jnp.ndarray


def pi_ode(p: PIParams, x_i, inp, sat_ext=0):
    """Continuous PI dynamics (`control.jl:52-81`): returns (x_i_dot, out)."""
    u_p = p.beta_p * inp
    u_i = inp
    y_p = p.k_p * u_p
    y_i = x_i
    out_free = y_p + y_i
    output = jnp.clip(out_free, p.bound_lo, p.bound_hi)
    sat_out = saturation_status(out_free, p.bound_lo, p.bound_hi)
    int_halted = _halted(u_i, sat_out, sat_ext)
    x_i_dot = p.k_i * u_i * (1.0 - int_halted) - p.k_l * x_i
    return x_i_dot, PIOutput(y_p, y_i, out_free, sat_out, output, int_halted)


# ---------------------------------------------------------------- Integrator

class IntegratorState(NamedTuple):
    x0: jnp.ndarray
    sat_out_0: jnp.ndarray


def integrator_state(x0=0.0):
    x0 = jnp.asarray(x0, dtype=float)
    return IntegratorState(x0=x0, sat_out_0=jnp.zeros_like(x0, dtype=jnp.int32))


class IntegratorOutput(NamedTuple):
    x1: jnp.ndarray
    output: jnp.ndarray
    sat_out: jnp.ndarray
    halted: jnp.ndarray


def integrator_step(s: IntegratorState, inp, dt, bound_lo=-INF, bound_hi=INF,
                    sat_ext=0):
    """Discrete integrator with halt-on-saturation (`control.jl:164-185`)."""
    halted = _halted(inp, s.sat_out_0, sat_ext)
    x1 = s.x0 + dt * inp * (1.0 - halted)
    output = jnp.clip(x1, bound_lo, bound_hi)
    sat_out = saturation_status(x1, bound_lo, bound_hi)
    return (IntegratorState(x0=x1, sat_out_0=sat_out),
            IntegratorOutput(x1, output, sat_out, halted))


# ------------------------------------------------------------------ LeadLag

class LeadLagState(NamedTuple):
    u0: jnp.ndarray  # previous input
    x0: jnp.ndarray  # previous state


def leadlag_state():
    return LeadLagState(u0=jnp.asarray(0.0), x0=jnp.asarray(0.0))


def leadlag_step(s: LeadLagState, u1, dt, z=-1.0, p=-10.0, k=1.0):
    """Tustin-discretized lead/lag with zero z, pole p, gain k
    (`control.jl:325-346`)."""
    a0 = (2 + p * dt) / (2 - p * dt)
    b1 = (2 - z * dt) / (2 - p * dt)
    b0 = (-2 - z * dt) / (2 - p * dt)
    x1 = a0 * s.x0 + b1 * u1 + b0 * s.u0
    y1 = k * x1
    return LeadLagState(u0=jnp.asarray(u1), x0=x1), y1


# ---------------------------------------------------------------------- PID

class PIDParams(NamedTuple):
    k_p: jnp.ndarray
    k_i: jnp.ndarray
    k_d: jnp.ndarray
    tau_f: jnp.ndarray      # derivative filter time constant
    beta_p: jnp.ndarray
    beta_d: jnp.ndarray
    bound_lo: jnp.ndarray
    bound_hi: jnp.ndarray


def pid_params(k_p=1.0, k_i=0.0, k_d=0.0, tau_f=0.01, beta_p=1.0, beta_d=1.0,
               bound_lo=-INF, bound_hi=INF):
    a = lambda v: jnp.asarray(v, dtype=float)
    return PIDParams(a(k_p), a(k_i), a(k_d), a(tau_f), a(beta_p), a(beta_d),
                     a(bound_lo), a(bound_hi))


class PIDState(NamedTuple):
    x_i0: jnp.ndarray
    x_d0: jnp.ndarray
    sat_out_0: jnp.ndarray


def pid_state(shape=()):
    return PIDState(x_i0=jnp.zeros(shape), x_d0=jnp.zeros(shape),
                    sat_out_0=jnp.zeros(shape, dtype=jnp.int32))


class PIDOutput(NamedTuple):
    y_p: jnp.ndarray
    y_i: jnp.ndarray
    y_d: jnp.ndarray
    out_free: jnp.ndarray
    sat_out: jnp.ndarray
    output: jnp.ndarray
    int_halted: jnp.ndarray


def pid_step(p: PIDParams, s: PIDState, inp, dt, sat_ext=0):
    """Gain-schedulable PID: backward-Euler integral, filtered derivative
    (`control.jl:431-471`)."""
    alpha = 1.0 / (p.tau_f + dt)
    u_p = p.beta_p * inp
    u_d = p.beta_d * inp
    u_i = inp

    int_halted = _halted(u_i, s.sat_out_0, sat_ext)
    x_i = s.x_i0 + dt * p.k_i * u_i * (1.0 - int_halted)
    x_d = alpha * p.tau_f * s.x_d0 + dt * alpha * p.k_d * u_d

    y_p = p.k_p * u_p
    y_i = x_i
    y_d = alpha * (-s.x_d0 + p.k_d * u_d)
    out_free = y_p + y_i + y_d
    sat_out = saturation_status(out_free, p.bound_lo, p.bound_hi)
    output = jnp.clip(out_free, p.bound_lo, p.bound_hi)

    s_new = PIDState(x_i0=x_i, x_d0=x_d, sat_out_0=sat_out)
    return s_new, PIDOutput(y_p, y_i, y_d, out_free, sat_out, output,
                            int_halted)


# ---------------------------------------------------------------------- LQR

class LQRParams(NamedTuple):
    """Gains + trim point for a steady-state LQR tracker
    (`control.jl:620-629`)."""
    K_fbk: jnp.ndarray      # (NU, NX)
    K_fwd: jnp.ndarray      # (NU, NZ)
    K_int: jnp.ndarray      # (NU, NZ)
    x_trim: jnp.ndarray     # (NX,)
    u_trim: jnp.ndarray     # (NU,)
    z_trim: jnp.ndarray     # (NZ,)
    bound_lo: jnp.ndarray   # (NU,)
    bound_hi: jnp.ndarray   # (NU,)


def lqr_params(nx, nu, nz, **kw):
    d = dict(K_fbk=jnp.zeros((nu, nx)), K_fwd=jnp.zeros((nu, nz)),
             K_int=jnp.zeros((nu, nz)), x_trim=jnp.zeros(nx),
             u_trim=jnp.zeros(nu), z_trim=jnp.zeros(nz),
             bound_lo=jnp.full(nu, -INF), bound_hi=jnp.full(nu, INF))
    d.update({k: jnp.asarray(v, dtype=float) for k, v in kw.items()})
    return LQRParams(**d)


class LQRState(NamedTuple):
    int_out_0: jnp.ndarray   # (NU,)
    out_sat_0: jnp.ndarray   # (NU,) int32


def lqr_state(nu):
    return LQRState(int_out_0=jnp.zeros(nu),
                    out_sat_0=jnp.zeros(nu, dtype=jnp.int32))


class LQROutput(NamedTuple):
    int_in: jnp.ndarray
    int_halted: jnp.ndarray
    int_out: jnp.ndarray
    out_free: jnp.ndarray
    out_sat: jnp.ndarray
    output: jnp.ndarray


def _mv(M, v):
    # multiply+reduce (not dot_general): lowers inside Pallas kernels
    return jnp.sum(M * v[..., None, :], axis=-1)


def lqr_step(p: LQRParams, s: LQRState, x, z, z_ref, dt, sat_ext=0):
    """LQR tracker update (`control.jl:708-743`)."""
    int_in = _mv(p.K_int, z_ref - z)
    int_halted = _halted(int_in, s.out_sat_0, sat_ext)
    int_out = s.int_out_0 + dt * int_in * (1.0 - int_halted)

    out_free = (p.u_trim + int_out + _mv(p.K_fwd, z_ref - p.z_trim)
                - _mv(p.K_fbk, x - p.x_trim))
    out_sat = saturation_status(out_free, p.bound_lo, p.bound_hi)
    output = jnp.clip(out_free, p.bound_lo, p.bound_hi)

    s_new = LQRState(int_out_0=int_out, out_sat_0=out_sat)
    return s_new, LQROutput(int_in, int_halted, int_out, out_free, out_sat,
                            output)


# ------------------------------------------------------------ gain schedules

def schedule(lookup_tree, *coords):
    """Evaluate a pytree of `flightjax.ops.interp.Lookup`s at a query point,
    returning the same pytree of values — the functional equivalent of the
    reference's HDF5 gain lookups + `assign!` (`control.jl:832-994`).
    Non-Lookup leaves pass through unchanged (static gains)."""
    from flightjax.ops.interp import Lookup

    def ev(leaf):
        return leaf(*coords) if isinstance(leaf, Lookup) else leaf

    return jax.tree.map(ev, lookup_tree,
                        is_leaf=lambda x: isinstance(x, Lookup))


def save_schedule(path, params_grid, axes, axis_names):
    """Persist a gain schedule: a params pytree whose leaves carry leading
    grid dims matching `axes`. Stored as npz (our HDF5-equivalent,
    `control.jl:855-935`)."""
    import numpy as np
    leaves, treedef = jax.tree.flatten(params_grid)
    np.savez_compressed(
        path,
        __axes__=np.asarray(len(axes)),
        **{f"axis_{i}_{n}": np.asarray(a) for i, (a, n) in enumerate(zip(axes, axis_names))},
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_schedule(path, params_like, extrap="flat"):
    """Load a gain schedule saved by `save_schedule` into a pytree of
    Lookups shaped like `params_like` (used only for tree structure)."""
    import numpy as np
    from flightjax.ops.interp import Lookup

    data = np.load(path)
    n_axes = int(data["__axes__"])
    axes = []
    for i in range(n_axes):
        key = [k for k in data.files if k.startswith(f"axis_{i}_")][0]
        axes.append(data[key])
    leaves_like, treedef = jax.tree.flatten(params_like)
    lookups = [Lookup(tuple(axes), data[f"leaf_{i}"], extrap=extrap)
               for i in range(len(leaves_like))]
    return jax.tree.unflatten(treedef, lookups)
