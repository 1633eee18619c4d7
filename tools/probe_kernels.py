"""Compile ONE of the split cluster-step Pallas kernels on the current TPU,
in isolation, to find which kernel(s) exceed the remote Mosaic compile
helper's memory cap.

Run: python tools/probe_kernels.py <k_kinair|k_systems|k_dynamics|k_finish_kin|k_finish_sys> [batch] [major|minor]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    name = sys.argv[1]
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    layout = sys.argv[3] if len(sys.argv) > 3 else "major"

    from flightjax.models.c172 import flagship_sim
    import flightjax.parallel.clusterstep as cs
    import flightjax.parallel.pallas_block as pb_mod
    real_pb = pb_mod.pallas_block
    real_pbm = pb_mod.pallas_block_minor

    captured = {}

    def spy(fn, args, **kw):
        k = real_pb(fn, args, **kw)
        captured[kw.get("name")] = (k, args)
        return k

    def spy_minor(fn, args, **kw):
        k = real_pbm(fn, args, **kw)
        # pallas_block_minor takes batch-major example args; the built
        # kernel itself consumes batch-minor operands
        margs = jax.tree.map(
            lambda a: (jnp.moveaxis(a, 0, -1)
                       if jnp.ndim(a) >= 2 and jnp.shape(a)[0] == batch
                       else a), args)
        captured[kw.get("name")] = (k, margs)
        return k

    # the split builder does `from ...pallas_block import pallas_block`
    # at call time, so patch the source module (and the re-import in
    # clusterstep's top level for the non-split path)
    pb_mod.pallas_block = spy
    pb_mod.pallas_block_minor = spy_minor
    cs.pallas_block = spy
    try:
        sim, state0, ctx = flagship_sim()
        state = jax.tree.map(
            lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
        cs.make_cluster_step(sim, state, ctx, split="subsystems",
                             layout=layout)
    finally:
        pb_mod.pallas_block = real_pb
        pb_mod.pallas_block_minor = real_pbm
        cs.pallas_block = real_pb

    order = ([name] if name != "all" else
             ["k_dynamics", "k_kinair", "k_finish_kin", "k_finish_sys",
              "k_systems"])
    for nm in order:
        kern, args = captured[nm]
        print(f"compiling {nm} alone at batch={batch} ...", flush=True)
        t0 = time.perf_counter()
        try:
            out = jax.block_until_ready(jax.jit(kern)(*args))
            print(f"PROBE OK {nm}: {time.perf_counter() - t0:.1f}s, "
                  f"{len(jax.tree.leaves(out))} outputs", flush=True)
        except Exception as exc:
            msg = str(exc)
            for marker in ("Scoped allocation", "SIGKILL", "Ran out of"):
                k = msg.find(marker)
                if k >= 0:
                    msg = msg[k:k + 200]
                    break
            print(f"PROBE FAIL {nm}: {time.perf_counter() - t0:.1f}s: "
                  f"{type(exc).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
