"""Sweep XLA TPU fusion/scheduler options on the rolled plain step and
measure us/fleet-step. Each option set compiles the 200-step roll once.

Run: python tools/exp_xlaflags.py set1 [set2 ...]   (or `all`)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
except Exception:
    pass

BATCH = 4096
STEPS = 200

SETS = {
    "base": {},
    "mlnlf": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    "mof": {"xla_tpu_multi_output_fusion_limit": "1024",
            "xla_tpu_multioutput_fusion_max_operands": "64"},
    "rwb": {"xla_tpu_rwb_fusion": "true"},
    "wrap": {"xla_tpu_wrap_fusion_lowerable_hlos_in_loop_fusion": "true"},
    "combo": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true",
              "xla_tpu_multi_output_fusion_limit": "1024",
              "xla_tpu_multioutput_fusion_max_operands": "64",
              "xla_tpu_rwb_fusion": "true"},
}


def main():
    names = sys.argv[1:] or ["base"]
    if names == ["all"]:
        names = list(SETS)
    from flightjax.models.c172 import flagship_sim

    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (BATCH,) + jnp.shape(l)), state0)

    def roll(st):
        def body(st, _):
            return jax.vmap(lambda s: sim.step(s, ctx))(st), None
        return jax.lax.scan(body, st, None, length=STEPS)[0]

    lowered = jax.jit(roll).lower(state)
    for name in names:
        opts = SETS[name]
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as exc:
            print(f"{name}: COMPILE FAIL {type(exc).__name__}: {exc}",
                  flush=True)
            continue
        print(f"{name}: compiled in {time.perf_counter() - t0:.1f}s",
              flush=True)
        carry = jax.block_until_ready(compiled(state))
        carry = jax.block_until_ready(compiled(carry))
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            carry = compiled(carry)
        jax.block_until_ready(carry)
        dt = time.perf_counter() - t0
        us = dt / (n * STEPS) * 1e6
        print(f"{name}: {us:.1f} us/fleet-step = "
              f"{BATCH / us:.2f}M vehicle-steps/s  opts={opts}", flush=True)


if __name__ == "__main__":
    main()
