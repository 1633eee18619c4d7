"""Static lint of the Pallas cluster-kernel bodies for Mosaic-unsupported
ops, entirely on CPU — no remote compile round-trip.

Currently checks for the "insertion of minor dim that is not a no-op is
only supported for 32-bit types" rule: any `broadcast_in_dim` / `reshape`
whose operand is a sub-32-bit type (bool here) and whose minor (last)
dimension changes. These arise from `jnp.where(mask, vec_a, vec_b)` with
a lower-rank bool mask; the fix is the logical/arithmetic form
(`core.modeling.bscale` / `tree_where`).

Run: python tools/audit_mosaic.py   (CPU, ~2 min; exit 1 on findings)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

findings = []


def _minor(shape):
    return shape[-1] if len(shape) else 1


def _check_jaxpr(kname, jaxpr, depth=0):
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("broadcast_in_dim", "reshape"):
            (invar,) = eqn.invars[:1]
            in_aval = invar.aval
            out_aval = eqn.outvars[0].aval
            if (in_aval.dtype.itemsize < 4
                    and _minor(in_aval.shape) != _minor(out_aval.shape)):
                src = eqn.source_info.traceback
                frame = None
                if src is not None:
                    for f in src.frames:
                        if ("flightjax" in f.file_name
                                and "pallas_block" not in f.file_name
                                and "clusterstep" not in f.file_name):
                            line = getattr(f, "start_line",
                                           getattr(f, "line_num", "?"))
                            frame = f"{f.file_name}:{line}"
                            break
                findings.append(
                    f"[{kname}] {prim} {in_aval.str_short()} -> "
                    f"{out_aval.str_short()} at {frame}")
        for v in eqn.params.values():
            if isinstance(v, jax.extend.core.ClosedJaxpr):
                _check_jaxpr(kname, v.jaxpr, depth + 1)
            elif hasattr(v, "eqns"):
                _check_jaxpr(kname, v, depth + 1)
            elif isinstance(v, (tuple, list)):
                for b in v:
                    if isinstance(b, jax.extend.core.ClosedJaxpr):
                        _check_jaxpr(kname, b.jaxpr, depth + 1)


def main():
    from flightjax.models.c172 import flagship_sim
    from flightjax.parallel import pallas_block as pb
    from flightjax.parallel.clusterstep import make_cluster_step

    pb.AUDIT_HOOK = lambda name, closed: _check_jaxpr(
        name or "<kernel>", closed.jaxpr)

    batch = 1024
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (batch,) + jnp.shape(l)), state0)
    # building the step traces every kernel body through the hook; the
    # pallas_calls themselves are never executed
    make_cluster_step(sim, state, ctx, split="subsystems", block=512)

    if findings:
        print(f"{len(findings)} Mosaic-layout finding(s):")
        for f in findings:
            print(" ", f)
        raise SystemExit(1)
    print("audit clean")


if __name__ == "__main__":
    main()
