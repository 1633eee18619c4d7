"""Ceiling measurement for a fleet-level "gear skip" gate: replace the
GearSet strut/contact math with the exact wow=false defaults (what a
lax.cond skip branch would compute when the whole fleet is airborne) and
time the fleet roll. The delta vs the stock step is the upper bound of
the win from scalar-gating the gear subsystem.

Run: python tools/exp_gearskip.py [batch] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


def airborne_versions():
    from flightjax.physics import control as C
    from flightjax.physics.landinggear import (ContactY, GearSet, GearUnitY,
                                               StrutY)
    from flightjax.ops.quaternions import qrot

    E3 = jnp.asarray([0.0, 0.0, 1.0])

    def f_ode_airborne(self, x, u, t, kin, trn):
        n = self.n
        frc_dot, frc_out = C.pi_ode(self.unit.frc, x["frc"],
                                    jnp.zeros_like(x["frc"]))
        # wheel-endpoint height via the local geodetic down axis: curvature
        # error over the ~3 m lever arm is <1e-6 m (only logged, never fed
        # back into dynamics while airborne)
        down_e = qrot(kin.q_en, E3)
        r_bs_e = qrot(kin.q_eb, jnp.asarray(self.unit.r_bs))   # (n, 3)
        h_w0 = kin.h_e - jnp.sum(r_bs_e * down_e, axis=-1)     # (n,)
        delta_h = h_w0 - (trn.elevation + (kin.h_e - kin.h_o))

        z = jnp.zeros(n)
        z2, z3 = jnp.zeros((n, 2)), jnp.zeros((n, 3))
        qid = jnp.broadcast_to(jnp.asarray([1.0, 0, 0, 0]), (n, 4))
        bc = lambda leaf: jnp.broadcast_to(jnp.asarray(leaf),
                                           (n,) + jnp.shape(leaf))
        strut = StrutY(delta_h=delta_h, wow=jnp.zeros(n, bool),
                       xi=z, xi_dot=z, F_dmp_zs=z, psi_sw=z, alpha_ts=z,
                       r_sc_s=z3, q_sc=qid, r_bc_b=z3, q_bc=qid, v_ec_xy=z2,
                       trn=jax.tree.map(bc, trn))
        from flightjax.physics.dynamics import Wrench
        contact = ContactY(mu_roll=z, mu_skid=z, kappa_br=z, psi_cv=z,
                           mu_max=z2, mu_eff=z2, f_c=z3, F_c=z3,
                           wr_b=Wrench(F=z3, tau=z3), frc=frc_out)
        y = GearUnitY(strut=strut, contact=contact,
                      crashed=jnp.zeros(n, bool))
        return {"frc": frc_dot}, y

    def f_step_airborne(self, x, u, t, kin, trn):
        return {"frc": jnp.zeros_like(x["frc"])}

    return f_ode_airborne, f_step_airborne


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.physics.landinggear import GearSet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
    print(f"# {jax.devices()} batch={batch} steps={steps}", flush=True)

    def timed(tag):
        def roll_fn(st):
            def body(st, _):
                return sim.fleet_step(st, ctx), None
            st, _ = jax.lax.scan(body, st, None, length=steps, unroll=4)
            return st
        roll = jax.jit(roll_fn, donate_argnums=(0,))
        t0 = time.time()
        carry = jax.block_until_ready(roll(jax.tree.map(jnp.copy, state)))
        compile_s = time.time() - t0
        carry = jax.block_until_ready(roll(carry))
        n = 3
        t0 = time.perf_counter()
        for _ in range(n):
            carry = roll(carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / (n * steps)
        print(f"{tag:12s}: {dt*1e6:7.1f} us/fleet-step  "
              f"{batch/dt/1e6:6.2f}M steps/s  (compile {compile_s:.0f}s)",
              flush=True)
        return dt

    base = timed("stock")
    f_ode_air, f_step_air = airborne_versions()
    GearSet.f_ode = f_ode_air
    GearSet.f_step = f_step_air
    skip = timed("gear-skipped")
    print(f"ceiling: {(base - skip)*1e6:.1f} us/step "
          f"({(base/skip - 1)*100:.1f}% throughput)")


if __name__ == "__main__":
    main()
