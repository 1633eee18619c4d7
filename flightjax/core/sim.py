"""Fixed-step hybrid simulation engine under `jax.lax.scan`.

TPU-native replacement for the reference's OrdinaryDiffEq-based driver
(`sim.jl:183-381`). One integration step reproduces the reference's exact
event ordering (`sim.jl:204-218,301-381`):

    1. RK4 stages over the continuous state (f_ode, 4 evaluations)
    2. f_step      — post-step impulse (quaternion renorm, FSMs, crashes)
    3. f_periodic  — only when t has reached the next multiple of Δt;
                     fires with root counter `k` (the reference's `_n`),
                     which starts at 0 on the first firing at t = t0 + Δt
                     (no firing at t0 — `sim.jl:357-362`)
    4. output/save — y recomputed at the post-update state (the reference
                     logs the y left over from the last RK4 stage plus any
                     f_step/f_periodic writes — `sim.jl:345-347`; we
                     recompute once at (t_new, x_new) which is cleaner and
                     costs one extra f_ode only when saving)

Δt must be an integer multiple of dt (the reference supports dt > Δt by
letting the integrator shorten steps; with a fixed-step scan the natural
contract is steps_per_periodic = Δt/dt ∈ ℕ).

Everything is pure: `step` maps a `SimState` to the next, `run` scans it,
and whole fleets batch with `jax.vmap(sim.step)` over stacked states.
Early termination (the reference's `SimulationTermination` exceptions,
`sim.jl:23-44`) is a *mask*: components raise a `terminated` flag in their
discrete state and the world freezes that lane (see models).
"""

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from flightjax.core.modeling import canonical, tree_where


class SimState(NamedTuple):
    """Carried simulation state: time, step index, periodic firing counter,
    and the model's (x, u, s) pytrees. `c` is the optional compensated-
    accumulation residual (None = plain accumulation; see `comp_residuals`)
    — a list aligned with x's flattened leaves, so it never collides with
    model state."""
    t: Any
    i: Any  # integration step counter (int32)
    x: Any
    u: Any
    s: Any
    c: Any = None


def rk4_incr(f_ode, x, u, s, t, dt, ctx=()):
    """Classic RK4 increment over an arbitrary pytree continuous state.
    Matches the reference default algorithm (`sim.jl:186-196`). Returns the
    increment (not x + increment) so callers can apply a compensated add."""
    ax = partial(jax.tree.map, lambda a, b: a + b)  # pytree add

    def scaled(tree, c):
        return jax.tree.map(lambda v: c * v, tree)

    k1, _ = f_ode(x, u, s, t, *ctx)
    k2, _ = f_ode(ax(x, scaled(k1, dt / 2)), u, s, t + dt / 2, *ctx)
    k3, _ = f_ode(ax(x, scaled(k2, dt / 2)), u, s, t + dt / 2, *ctx)
    k4, _ = f_ode(ax(x, scaled(k3, dt)), u, s, t + dt, *ctx)

    return jax.tree.map(
        lambda a, b, c, d: (dt / 6.0) * (a + 2 * b + 2 * c + d), k1, k2, k3, k4)


def rk4_step(f_ode, x, u, s, t, dt, ctx=()):
    return jax.tree.map(lambda a, b: a + b,
                        x, rk4_incr(f_ode, x, u, s, t, dt, ctx))


def heun_incr(f_ode, x, u, s, t, dt, ctx=()):
    """Heun's-method increment (the reference's alternate low-order
    algorithm)."""
    add = partial(jax.tree.map, lambda a, b: a + b)
    k1, _ = f_ode(x, u, s, t, *ctx)
    x1 = add(x, jax.tree.map(lambda v: dt * v, k1))
    k2, _ = f_ode(x1, u, s, t + dt, *ctx)
    return jax.tree.map(lambda a, b: (dt / 2.0) * (a + b), k1, k2)


def heun_step(f_ode, x, u, s, t, dt, ctx=()):
    return jax.tree.map(lambda a, b: a + b,
                        x, heun_incr(f_ode, x, u, s, t, dt, ctx))


def rk4_loop_incr(f_ode, x, u, s, t, dt, ctx=()):
    """RK4 increment as a 4-iteration `fori_loop` — numerically identical to
    `rk4_incr` (same per-leaf association order), but the f_ode body
    appears ONCE in the jaxpr instead of four times. Used inside the
    Pallas megakernel, where Mosaic compile time scales with op count.
    Stage coefficients are selected with `where` chains (dynamic indexing
    of a constant vector does not lower in Mosaic)."""
    zeros = jax.tree.map(jnp.zeros_like, x)

    def body(i, carry):
        k_prev, acc = carry
        a = jnp.where(i == 0, 0.0, jnp.where(i == 3, 1.0, 0.5))
        b = jnp.where(jnp.logical_or(i == 0, i == 3), 1.0, 2.0)
        xi = jax.tree.map(lambda xv, kv: xv + (a * dt) * kv, x, k_prev)
        k, _ = f_ode(xi, u, s, t + a * dt, *ctx)
        acc = jax.tree.map(lambda av, kv: av + b * kv, acc, k)
        return (k, acc)

    _, acc = jax.lax.fori_loop(0, 4, body, (zeros, zeros))
    return jax.tree.map(lambda av: (dt / 6.0) * av, acc)


def rk4_step_loop(f_ode, x, u, s, t, dt, ctx=()):
    return jax.tree.map(lambda a, b: a + b,
                        x, rk4_loop_incr(f_ode, x, u, s, t, dt, ctx))


_INTEGRATORS = {"rk4": rk4_step, "heun": heun_step,
                "rk4_loop": rk4_step_loop}
_INCREMENTS = {"rk4": rk4_incr, "heun": heun_incr,
               "rk4_loop": rk4_loop_incr}


# --------------------------------------------------- compensated integration

def default_comp_predicate(path):
    """Which continuous-state leaves get compensated (Kahan) accumulation:
    the geodetic POSITION states of the kinematic mechanizations. Their
    per-step increments (~transport rate x dt ~ 1.6e-7 at cruise speed) sit
    at/below the f32 ulp of the O(1) state they update (unit quaternion
    q_ew, n-vector, latitude in rad), so plain f32 accumulation random-walks
    at ~1 m/s of flight — the classic single-precision INS limitation.
    Attitude (q_wb/q_eb/Euler) and velocity states have increments orders of
    magnitude above their ulp and need no compensation. h_e is included for
    near-level flight where v_z*dt underflows the metre-scale ulp."""
    keys = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    return ("kinematics" in keys
            and keys[-1] in ("q_ew", "n_e", "lat", "lon", "h_e"))


def comp_residuals(x, predicate=default_comp_predicate, force=False):
    """Residual list for compensated accumulation: one entry per flattened
    leaf of x (in `jax.tree.flatten` order), `zeros_like(leaf)` where the
    predicate selects the leaf path AND the leaf is inexact non-f64, else
    None. Returns None when nothing qualifies. With `force=True`, f64
    leaves also qualify (for tests)."""
    leaves = jax.tree_util.tree_flatten_with_path(x)[0]
    out, any_comp = [], False
    for path, v in leaves:
        v = jnp.asarray(v)
        ok = (predicate(path) and jnp.issubdtype(v.dtype, jnp.inexact)
              and (force or v.dtype != jnp.float64))
        out.append(jnp.zeros_like(v) if ok else None)
        any_comp = any_comp or ok
    return out if any_comp else None


def comp_add(x, incr, c):
    """Pytree add with compensated (Kahan/Neumaier) accumulation on the
    leaves where the residual list `c` (aligned with x's flattened leaves)
    is not None: the rounding error of each `x + incr` is captured and
    re-applied to the next step's increment, making the ACCUMULATED
    position exact to ~ulp of the increments instead of random-walking at
    the ulp of the state. The Neumaier (branchless two-sum) form stays
    exact even when an increment exceeds the state (h_e through zero)."""
    px, treedef = jax.tree_util.tree_flatten_with_path(x)
    incr_l = treedef.flatten_up_to(incr)
    out, c_new = [], []
    for (_, xv), iv, cv in zip(px, incr_l, c):
        if cv is None:
            out.append(xv + iv)
            c_new.append(None)
        else:
            y = iv + cv
            snew = xv + y
            err = jnp.where(jnp.abs(xv) >= jnp.abs(y),
                            (xv - snew) + y, (y - snew) + xv)
            c_new.append(err)
            out.append(snew)
    return jax.tree_util.tree_unflatten(treedef, out), c_new


def _turbulence_dt(obj, _depth=0):
    """The `dt` of a DrydenTurbulence model attached anywhere on the
    SimpleWorld -> Aircraft -> Vehicle chain, or None. Used by
    Simulation.__init__ to reject hold-interval mismatches."""
    if _depth > 4:
        return None
    turb = getattr(obj, "turbulence", None)
    if turb is not None:
        return getattr(turb, "dt", None)
    for name in ("aircraft", "vehicle"):
        child = getattr(obj, name, None)
        if child is not None:
            got = _turbulence_dt(child, _depth + 1)
            if got is not None:
                return got
    return None


class Simulation:
    """Simulation driver for a root component implementing the
    `flightjax.core.modeling.Component` protocol.

    Parameters mirror `Simulation(mdl; algorithm, dt, Δt, t_start, ...)`
    (`sim.jl:183-196`). `ctx` is a tuple of extra static/slow-varying
    arguments forwarded to the component's update functions.
    """

    def __init__(self, system, dt=0.02, periodic_dt=None, t_start=0.0,
                 algorithm="rk4", geoid_every=1, compensate="auto",
                 gear_gate_margin=None):
        self.system = system
        self.dt = float(dt)
        self.periodic_dt = float(periodic_dt) if periodic_dt is not None else float(dt)
        self.t_start = float(t_start)
        ratio = self.periodic_dt / self.dt
        self.steps_per_periodic = int(round(ratio))
        if abs(ratio - self.steps_per_periodic) > 1e-9 or self.steps_per_periodic < 1:
            raise ValueError(
                f"periodic_dt ({self.periodic_dt}) must be a positive integer "
                f"multiple of dt ({self.dt})")
        self.algorithm = algorithm
        self._integ = _INTEGRATORS[algorithm]
        self._integ_incr = _INCREMENTS[algorithm]
        self.geoid_every = int(geoid_every)
        # fleet-level gear gate: when set (metres), fleet_step skips the
        # strut/contact math through a scalar lax.cond whenever EVERY lane
        # is at least this far above the terrain (see
        # physics.landinggear.gear_gated; measured 56 us/fleet-step at
        # batch 4096). None (default) = exact per-step gear semantics.
        self.gear_gate_margin = (None if gear_gate_margin is None
                                 else float(gear_gate_margin))
        # "auto": attach Kahan residuals to the sub-f64 position states at
        # init() (see `default_comp_predicate`); False: never; or a custom
        # path predicate. States minted outside init() opt in by populating
        # SimState.c themselves (e.g. via `comp_residuals`).
        # True is the natural boolean spelling of "auto" (a bare True would
        # otherwise be treated as a path predicate and crash on call).
        self.compensate = "auto" if compensate is True else compensate
        # jitted-executable cache for run(): closures defined inside run()
        # would be new function objects every call, so each run() would
        # re-trace and re-compile the whole scan (55 s of "warm" time for a
        # 10 s flight on the C172). Cache per (save_every, save_y); ctx is a
        # traced argument so differing ctx values don't stale the cache.
        self._run_cache = {}
        # publish the effective sampling period on the system (the functional
        # analog of the reference's `mdl.Δt`, `modeling.jl:181-182`), so
        # discrete sub-updates can read their step size
        self.system.periodic_dt = self.periodic_dt
        # a Dryden turbulence model's noise-hold interval must equal the
        # engine step: a mismatch silently rescales every gust variance by
        # turb_dt/dt (the drive is eta*sqrt(pi/turb_dt) held for dt)
        turb_dt = _turbulence_dt(self.system)
        if turb_dt is not None and abs(turb_dt - self.dt) > 1e-12:
            raise ValueError(
                f"DrydenTurbulence(dt={turb_dt}) does not match "
                f"Simulation dt={self.dt}: the gust variance would be "
                f"scaled by {turb_dt / self.dt:.3g}")

    def replace(self, **overrides):
        """A fresh Simulation over the same system with some settings
        changed (e.g. `sim.replace(gear_gate_margin=None)` for
        ground-heavy fleets). Carries EVERY constructor setting the
        original had — hand-rolled reconstruction silently dropped
        t_start/algorithm."""
        kw = dict(system=self.system, dt=self.dt,
                  periodic_dt=self.periodic_dt, t_start=self.t_start,
                  algorithm=self.algorithm, geoid_every=self.geoid_every,
                  compensate=self.compensate,
                  gear_gate_margin=self.gear_gate_margin)
        kw.update(overrides)
        return Simulation(**kw)

    # ------------------------------------------------------------------ init

    def init(self, *args, **kwargs):
        """Build the initial SimState from the system's initializer. The
        system may define `init(*args) -> (x, u, s)`; otherwise the
        defaults from init_x/init_u/init_s are used."""
        if args or kwargs or hasattr(self.system, "init"):
            x, u, s = self.system.init(*args, **kwargs)
        else:
            x, u, s = (self.system.init_x(), self.system.init_u(),
                       self.system.init_s())
        t = jnp.asarray(self.t_start)
        c = None
        if self.compensate is not False and x is not None:
            pred = (default_comp_predicate if self.compensate == "auto"
                    else self.compensate)
            c = comp_residuals(x, pred)
        return canonical(SimState(t=t, i=jnp.asarray(0, dtype=jnp.int32),
                                  x=x, u=u, s=s, c=c))

    def with_compensation(self, state: SimState) -> SimState:
        """Attach compensated-accumulation residuals to a manually-built
        SimState per this Simulation's `compensate` policy. No-op if
        residuals are already attached, the policy is False, or no leaf
        qualifies (e.g. the whole state is f64)."""
        if state.c is not None or self.compensate is False or state.x is None:
            return state
        pred = (default_comp_predicate if self.compensate == "auto"
                else self.compensate)
        return state._replace(c=comp_residuals(state.x, pred))

    # ------------------------------------------------------------------ step

    def step(self, state: SimState, ctx=()) -> SimState:
        """Advance one dt: RK4 → f_step → (masked) f_periodic."""
        sys = self.system
        dt = self.dt
        t, i, x, u, s = state[:5]
        c = state.c

        if x is not None:
            if c is None:
                x = self._integ(sys.f_ode, x, u, s, t, dt, ctx)
            else:
                incr = self._integ_incr(sys.f_ode, x, u, s, t, dt, ctx)
                x, c = comp_add(x, incr, c)
        # exact boundary hits, no drift; strong-typed so the carry signature
        # is stable under jit (see core.modeling.canonical)
        t_new = jnp.asarray(self.t_start + (i + 1) * dt, jnp.result_type(t))
        i_new = i + 1

        x, s = sys.f_step(x, u, s, t_new, *ctx)

        spp = self.steps_per_periodic
        fires = (i_new % spp) == 0
        k = i_new // spp - 1  # the reference's `_n` at firing time
        new_xus = sys.f_periodic(x, u, s, t_new, k, *ctx)
        x, u, s = tree_where(fires, new_xus, (x, u, s))

        return SimState(t=t_new, i=i_new, x=x, u=u, s=s, c=c)

    def fleet_step(self, state: SimState, ctx=(), geoid_every=None) -> SimState:
        """Batched `step` over a stacked SimState (leading fleet axis), with
        the EGM96 geoid refresh hoisted out of the per-lane step.

        The refresh reads two [B, 1441] grid rows — by far the widest HBM
        traffic in the step (~50 MB/step at batch 4096) for a quantity whose
        true change per 20 ms step is micrometres (geoid slope <~1e-4 m/m,
        aircraft advance ~1.5 m/step). Hoisting it to fleet level makes the
        firing predicate a SCALAR (`state.i[0]`), so `lax.cond` genuinely
        skips the branch at runtime — under `vmap` the per-lane predicate
        would lower to a select that always executes both sides.

        `geoid_every` = K refreshes the carried undulation on every K-th
        step (default: the Simulation's `geoid_every`, itself default 1 =
        exact per-step semantics). All lanes share one step counter (true
        for any fleet stepped together from a common start index).

        When `gear_gate_margin` is set, the strut/contact math is likewise
        hoisted behind a fleet-level scalar `lax.cond`: the gate is
        `any(h_agl < margin)` over the CURRENT state, conservative because
        no lane more than `margin` m above terrain can touch ground within
        one dt (see `Vehicle.h_agl`, `landinggear.gear_gated`)."""
        import contextlib

        from flightjax.parallel.megakernel import find_vehicle
        from flightjax.physics.aircraftbase import geoid_deferred

        K = self.geoid_every if geoid_every is None else int(geoid_every)
        vehicle = find_vehicle(self.system)

        gear_cm = contextlib.nullcontext()
        if (self.gear_gate_margin is not None and vehicle is not None
                and hasattr(vehicle, "h_agl")):
            from flightjax.physics.landinggear import gear_gated
            h = jax.vmap(vehicle.h_agl)(state.x["vehicle"],
                                        state.u["vehicle"],
                                        state.s["vehicle"])
            gear_cm = gear_gated(jnp.any(h < self.gear_gate_margin))

        # NavAvionics aiding-epoch gates (physics/navigation.py): the
        # monitored GPS/baro/mag filter blocks only do work on 1 of
        # *_every firings, and the epoch counter is fleet-uniform —
        # hoist them behind fleet-level scalar lax.conds like the gear
        # gate
        nav_cm = contextlib.nullcontext()
        av = getattr(getattr(self.system, "aircraft", None),
                     "avionics", None)
        if (av is not None and hasattr(av, "epoch_preds")
                and isinstance(state.s, dict) and "avionics" in state.s):
            preds = av.epoch_preds(state.s["avionics"])
            if preds is not None:
                from flightjax.physics.navigation import epoch_gated
                nav_cm = epoch_gated(preds)

        if vehicle is None or not getattr(vehicle, "geoid_in_step", False):
            with gear_cm, nav_cm:
                return jax.vmap(lambda st: self.step(st, ctx))(state)

        with gear_cm, nav_cm, geoid_deferred():
            new = jax.vmap(lambda st: self.step(st, ctx))(state)

        # narrow cond operands to the position states + the undulation
        # vector itself: threading the whole (x, s) through the cond made
        # the identity branch copy the entire fleet state every step
        # (measured 7.6 us/step at batch 4096)
        def refresh(operand):
            xk, _ = operand
            return jax.vmap(vehicle.geoid_N_from_kin)(xk)

        i0 = new.i.reshape(-1)[0]
        s_veh = new.s["vehicle"]
        N = jax.lax.cond((i0 % K) == 0, refresh, lambda op: op[1],
                         (new.x["vehicle"]["kinematics"], s_veh["geoid_N"]))
        s2 = dict(new.s, vehicle=dict(s_veh, geoid_N=N))
        return new._replace(s=s2)

    def output(self, state: SimState, ctx=()):
        """Compute the model output y at the current state."""
        _, y = self.system.f_ode(state.x, state.u, state.s, state.t, *ctx)
        return y

    # ------------------------------------------------------------------- run

    def run(self, state: SimState, t_end, ctx=(), save_every=1, save_y=True,
            t0=None, dispatch_blocks=None, unroll=1):
        """Scan the step function until t_end. Returns (final_state,
        TimeSeries) where the TimeSeries holds every `save_every`-th step's
        (t, y) — the reference's `saveat` thinning (`sim.jl:211`).
        With save_y=False only t is logged (cheapest; no extra f_ode).

        The step count must be static: when calling `run` inside jit (where
        `state.t` is traced), pass the known start time as `t0`.

        `dispatch_blocks`: cap on save blocks per device dispatch. Long runs
        as one XLA execution can exceed accelerator watchdog limits (the
        600 s autopilot flight is ~60 s of device time in one dispatch);
        with a cap, the outer loop runs host-side over identical jitted
        chunks (one compilation, many short dispatches).

        `unroll`: XLA scan-body unroll factor for the inner (per-step)
        scan. Unrolling lets XLA fuse across step boundaries, amortizing
        per-kernel dispatch overhead — the dominant cost of small-batch /
        single-vehicle steps (see docs/notes/performance.md); the fleet
        path (`fleet_rollout`) exposes the same knob."""
        state = canonical(state)  # weak-typed leaves would force a retrace
        if t0 is None:
            try:
                t0 = float(state.t)
            except Exception as exc:
                raise ValueError(
                    "run() inside jit needs an explicit static t0 (state.t "
                    "is traced)") from exc
        n_steps = int(round((float(t_end) - t0) / self.dt))
        n_blocks, rem = divmod(n_steps, save_every)

        scan_blocks = self._jit_scan_blocks(save_every, save_y, unroll)
        if dispatch_blocks is None or n_blocks <= dispatch_blocks:
            state, (ts, ys) = scan_blocks(state, ctx, k=n_blocks)
        else:
            logs = []
            done = 0
            while done + dispatch_blocks <= n_blocks:
                state, log = scan_blocks(state, ctx, k=dispatch_blocks)
                logs.append(log)
                done += dispatch_blocks
            if done < n_blocks:
                state, log = scan_blocks(state, ctx, k=n_blocks - done)
                logs.append(log)
            ts = jnp.concatenate([l[0] for l in logs])
            ys = (jax.tree.map(lambda *xs: jnp.concatenate(xs),
                               *[l[1] for l in logs]) if save_y else None)
        if rem:
            step_fn = self._jit_step()
            for _ in range(rem):
                state = step_fn(state, ctx)
        return state, TimeSeries(ts, ys)

    def _jit_scan_blocks(self, save_every, save_y, unroll=1):
        """Jitted `k`-block scan for run(), cached per (save_every, save_y,
        unroll) so repeated run() calls on matching state shapes reuse one
        XLA executable (only `k` changes force a fresh compile)."""
        key = ("blocks", save_every, save_y, unroll)
        fn = self._run_cache.get(key)
        if fn is None:
            @partial(jax.jit, static_argnames=("k",))
            def scan_blocks(st, ctx, k):
                def inner(st, _):
                    return self.step(st, ctx), None

                def body(st, _):
                    st, _ = jax.lax.scan(inner, st, None, length=save_every,
                                         unroll=unroll)
                    y = self.output(st, ctx) if save_y else None
                    return st, (st.t, y)

                return jax.lax.scan(body, st, None, length=k)

            fn = self._run_cache[key] = scan_blocks
        return fn

    def _jit_step(self):
        fn = self._run_cache.get("step")
        if fn is None:
            fn = self._run_cache["step"] = jax.jit(
                lambda st, ctx: self.step(st, ctx))
        return fn


@jax.tree_util.register_pytree_node_class
class TimeSeries:
    """Scan-stacked log: `t` is (n,), `y` a pytree with leading dim n.
    Property-path access recurses into the y pytree (the reference's
    recursive `TimeSeries` getproperty, `sim.jl:644-704`): `ts.kin.v_eb_n`
    returns a TimeSeries over that subtree."""

    def __init__(self, t, y):
        self.t = t
        self.y = y

    def tree_flatten(self):
        return (self.t, self.y), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __getattr__(self, name):
        y = object.__getattribute__(self, "y")
        if isinstance(y, dict):
            return TimeSeries(self.t, y[name])
        return TimeSeries(self.t, getattr(y, name))

    def __getitem__(self, key):
        return TimeSeries(self.t, self.y[key])

    def __len__(self):
        return len(self.t)

    # reference accessors (`sim.jl:674-680`)
    def get_time(self):
        return self.t

    def get_data(self):
        return self.y

    def get_components(self):
        """Split a vector-valued series into per-component TimeSeries
        (`sim.jl:678-680`); on a dict/NamedTuple node, one per child."""
        y = self.y
        if isinstance(y, dict):
            return {k: TimeSeries(self.t, v) for k, v in y.items()}
        if hasattr(y, "_fields"):  # NamedTuple
            return {k: TimeSeries(self.t, getattr(y, k)) for k in y._fields}
        return [TimeSeries(self.t, y[..., i]) for i in range(y.shape[-1])]
