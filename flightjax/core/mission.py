"""Scripted-mission phase machines, in-graph.

The reference scripts full missions (crosswind landing, traffic pattern)
through a `user_callback!` mutating inputs per phase with imperative
if/elseif chains on the vehicle state (`c172_demos.jl:406-660`). The
TPU-native equivalent is a pure phase machine wrapped around the avionics:
the phase index lives in the discrete state, each periodic firing applies
the current phase's input overrides (`lax.switch`) and advances the index
when the phase's completion predicate fires — fully jittable, vmappable
(every fleet lane can be in a different phase).
"""

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class Phase(NamedTuple):
    """One mission leg.

    apply(u_avionics, veh_y, t) -> u_avionics : input overrides while active
    done(veh_y, t) -> bool scalar             : advance to the next phase
    systems(u_systems) -> u_systems           : vehicle-systems overrides
        while active (flaps, brakes, engine start — the reference callbacks
        write these directly, e.g. `c172_demos.jl:469-479,545-546,625-630`)

    `t` is the mission clock (seconds since mission start, carried in the
    discrete state). Only the CURRENT phase's overrides run each firing, so
    each phase must specify its complete override set (overrides do not
    accumulate across phases) — exactly like the reference's per-phase
    callback branches (`c172_demos.jl:406-660`).
    """
    name: str
    apply: Callable
    done: Callable
    systems: Callable = None


def _hold(u, y, t):
    return u


def _never(y, t):
    return jnp.asarray(False)


class MissionAvionics:
    """Wrap an avionics component with a phase machine. Satisfies the same
    Aircraft avionics protocol; adds s['phase'] (int32)."""

    def __init__(self, inner, phases: Sequence[Phase]):
        self.inner = inner
        self.phases = list(phases)

    def init_u(self):
        return self.inner.init_u()

    def init_s(self):
        s = self.inner.init_s()
        return {"inner": s, "phase": jnp.asarray(0, dtype=jnp.int32),
                "t": jnp.asarray(0.0)}

    def f_periodic(self, s, u, veh_y, dt):
        phase = s["phase"]
        t = s["t"]

        u_over = jax.lax.switch(
            jnp.clip(phase, 0, len(self.phases) - 1),
            [lambda uu, p=p: p.apply(uu, veh_y, t) for p in self.phases],
            u)
        done = jax.lax.switch(
            jnp.clip(phase, 0, len(self.phases) - 1),
            [lambda p=p: jnp.asarray(p.done(veh_y, t))
             for p in self.phases])
        phase_new = jnp.where(
            jnp.logical_and(done, phase < len(self.phases) - 1),
            phase + 1, phase).astype(jnp.int32)

        s_inner, y_inner = self.inner.f_periodic(s["inner"], u_over, veh_y,
                                                 dt)
        return ({"inner": s_inner, "phase": phase_new, "t": t + dt},
                {"inner": y_inner, "phase": phase_new})

    def assign(self, u_systems, av_y):
        u_systems = self.inner.assign(u_systems, av_y["inner"])
        if any(p.systems is not None for p in self.phases):
            u_systems = jax.lax.switch(
                jnp.clip(av_y["phase"], 0, len(self.phases) - 1),
                [(lambda uu, p=p: p.systems(uu)) if p.systems is not None
                 else (lambda uu: uu) for p in self.phases],
                u_systems)
        return u_systems

    def output(self, s, u, veh_y):
        return {"inner": self.inner.output(s["inner"], u, veh_y),
                "phase": s["phase"]}

    def init_from_trim(self, veh_y, dt):
        u, s = self.inner.init_from_trim(veh_y, dt)
        return u, {"inner": s, "phase": jnp.asarray(0, dtype=jnp.int32),
                   "t": jnp.asarray(0.0)}
