"""Profile the batch-4096 fleet step on the real TPU and attribute device
time to flightjax source lines.

`jax.profiler.trace` works through the axon tunnel (verified 2026-08-18):
the trace contains one X event per executed HLO instruction with device
wall time. Joining those against the optimized HLO's `metadata.source_file/
source_line` gives a per-module, per-line cost breakdown — this is how the
dense-interp kron contraction was found at 27% of the step (see
ops/interp.py) and the geoid-refresh cond at ~190 us per firing.

Usage:
    python tools/profile_fleet.py            # profile + breakdown
    python tools/profile_fleet.py --batch 8192
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

STEPS = 100


def attribute(trace_dir, hlo_text, steps=STEPS, top=25, unroll=1):
    """Join trace event durations with HLO source metadata. Returns
    (per_file, per_site, unmatched) Counters in us per step."""
    f = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.trace.json.gz"))[-1]
    tr = json.load(gzip.open(f))
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("name"):
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    src = {}
    comp_files = {}          # computation name -> Counter(file:line)
    comp = None
    fusion_calls = {}        # fusion instruction name -> called computation
    for line in hlo_text.split("\n"):
        mc = re.match(r"(?:ENTRY )?%?([\w.\-]+) \([\w.,: \[\]{}/#()-]*\) -> ",
                      line)
        if mc:                       # computation header (incl. ENTRY)
            comp = mc.group(1)
            comp_files[comp] = collections.Counter()
        # the result type of a multi-output fusion is a tuple containing
        # spaces and layout annotations with parens — "(f32[4096]{0:T(8,
        # 128)}, ...)" — so anchor on the (lowercase) opcode token instead
        # of trying to parse the type
        m = re.search(r"%([\w.\-]+) = (.*?) ([a-z][\w-]*)\(", line)
        if not m:
            continue
        name, shape = m.group(1), m.group(2).split("{")[0]
        if len(shape) > 28:
            shape = shape[:25] + "..."
        mm = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        if mm and comp is not None:
            comp_files[comp][(mm.group(1).split("repo/")[-1],
                              mm.group(2))] += 1
        mcall = re.search(r"calls=%?([\w.\-]+)", line)
        if mcall:
            fusion_calls[name] = mcall.group(1)
        src[name] = ((mm.group(1).split("repo/")[-1] if mm else "?"),
                     (mm.group(2) if mm else "?"), shape)

    def resolve(name):
        """Attribution for a trace kernel name: direct, suffix-stripped, or
        through its fused computation's dominant per-op source site; falls
        back to a '?'-file src entry only after all real candidates fail."""
        cands = (name, re.sub(r"\.(clone|remat)[\d.]*$", "", name))
        for cand in cands:
            if cand in src and src[cand][0] != "?":
                return src[cand]
            called = fusion_calls.get(cand)
            if called is None and cand.startswith("fusion"):
                called = "fused_computation" + cand[len("fusion"):]
            if called in comp_files and comp_files[called]:
                (fl, ln), _ = comp_files[called].most_common(1)[0]
                shape = src[cand][2] if cand in src else "?"
                return (fl, ln, shape)
        for cand in cands:
            if cand in src:
                return src[cand]
        return None

    byfile = collections.Counter()
    bysite = collections.Counter()
    un = collections.Counter()
    for name, d in dur.items():
        # only kernels inside the scan body: an unrolled body executes each
        # (distinct) kernel instance steps/unroll times
        if cnt[name] < steps // unroll // 2:
            continue
        hit = resolve(name)
        if hit is not None:
            fl, ln, shape = hit
            byfile[fl] += d / steps
            bysite[(fl, ln, shape)] += d / steps
        else:
            un[name] += d / steps
    return byfile, bysite, un


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--unroll", type=int, default=1,
                    help="scan unroll factor (bench.py uses 4)")
    ap.add_argument("--trace-dir", default="/tmp/flightjax_trace")
    args = ap.parse_args()

    from flightjax.models.c172 import flagship_sim
    sim, state0, ctx = flagship_sim()
    state = jax.tree.map(
        lambda l: jnp.broadcast_to(l, (args.batch,) + jnp.shape(l)), state0)

    @jax.jit
    def roll(st):
        def body(st, _):
            return sim.fleet_step(st, ctx), None
        st, _ = jax.lax.scan(body, st, None, length=STEPS,
                             unroll=args.unroll)
        return st

    compiled = roll.lower(state).compile()
    st = jax.block_until_ready(compiled(state))
    with jax.profiler.trace(args.trace_dir):
        st = jax.block_until_ready(compiled(st))

    byfile, bysite, un = attribute(args.trace_dir, compiled.as_text(),
                                   unroll=args.unroll)
    total = sum(byfile.values()) + sum(un.values())
    print(f"# per-step device time: {total:.1f} us  (batch {args.batch})")
    print("# -- by file (us/step) --")
    for k, v in byfile.most_common(15):
        print(f"{v:8.1f}  {k}")
    print(f"{sum(un.values()):8.1f}  <unattributed small fusions>")
    print("# -- top sites (us/step) --")
    for (fl, ln, shape), v in bysite.most_common(20):
        print(f"{v:8.2f}  {fl}:{ln}  {shape}")


if __name__ == "__main__":
    main()
