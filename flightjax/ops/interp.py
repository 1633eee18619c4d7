"""N-D multilinear interpolation on regular (rectilinear) grids.

The TPU-native replacement for the reference's Interpolations.jl linear
B-spline lookups (aero tables `c172.jl:162-196`, engine charts
`piston.jl:84-149`, propeller coefficient tables `propellers.jl:215-325`,
gain schedules `control.jl:950-994`, EGM96 geoid `geodesy.jl:161-211`).

Two extrapolation modes per axis, matching Interpolations.jl semantics:
- 'flat': clamp the query to the grid bounds (Flat())
- 'line': continue the edge-cell gradient linearly (Line())

A `Lookup` is a pytree (axes + values are leaves), so it can be captured in
jitted functions, vmapped over query points, and donated/sharded like any
other array. Evaluation is gather + FMA over the 2^d cell corners — XLA
fuses this; for large batched multi-table lookups see `flightjax.ops.pallas`.
"""

import jax
import jax.numpy as jnp
import numpy as np

# When True (set by ops.mathx.mosaic_safe() during Pallas kernel traces),
# dense static evaluation uses the reshape-free kron-matmul contraction that
# lowers under Mosaic. The default plain-XLA path uses the joint-weight
# outer product + single matmul below, which is ~3x less HBM traffic: the
# kron form materializes one (B, R) product per axis, and the device trace
# showed those matmuls alone at 27% of the fleet-step time (batch 4096).
_KRON_STATIC = False

# MXU passes for the dense-contraction matmuls. HIGHEST is the 6-pass
# bf16 f32-emulation algorithm; HIGH (3-pass) carries the full f32
# mantissa for these short, well-conditioned hat-weight sums and halves
# the matmul device time (CPU/f64 paths ignore the setting entirely, so
# the drift/parity gates are unaffected). Overridable for experiments.
_PRECISION = jax.lax.Precision.HIGH

# First-axis contractions whose flattened output width R is at or below this
# threshold run as a VPU broadcast-multiply-reduce instead of an MXU matmul.
# Measured NEGATIVE on-chip (tools/exp_matvec.py, 2026-08-20: threshold 1 =
# 197.4 us/fleet-step vs 193.7 all-MXU at batch 4096 — the tiny matvecs
# overlap neighboring VPU kernels, so moving their work onto the VPU adds
# serial time; docs/notes/performance.md "VPU matvec threshold"). Ships 0
# (disabled); the branch is kept for future shapes and stays covered by
# tests/test_interp.py::test_dense_static_vpu_reduce_matches_matmul.
_VPU_MAX_R = 0


@jax.tree_util.register_pytree_node_class
class Lookup:
    """Multilinear interpolator over a rectilinear grid.

    axes: tuple of strictly increasing 1-D arrays (each length >= 2, or
          length 1 for a degenerate axis that is ignored).
    values: array whose first len(axes) dims match the axis lengths; any
          trailing dims are treated as vector-valued outputs.
    extrap: per-axis 'flat' | 'line' (or a single string for all axes).
    """

    def __init__(self, axes, values, extrap="flat", dense=None,
                 rowgather=False):
        self.axes = tuple(jnp.asarray(a) for a in axes)
        self.values = jnp.asarray(values)
        if isinstance(extrap, str):
            extrap = (extrap,) * len(self.axes)
        self.extrap = tuple(extrap)
        assert len(self.extrap) == len(self.axes)
        # dense (gather-free) evaluation for small tables: default on when
        # every axis is short enough that hat-basis contraction is cheap
        if dense is None:
            dense = all(int(a.shape[0]) <= 32 for a in self.axes)
        self.dense = bool(dense)
        # detect uniform axes at construction (on the original inputs,
        # before any float32 truncation): their cell index is direct
        # arithmetic (no searchsorted, no knot gathers)
        def _is_uniform(a):
            a = np.asarray(a, dtype=np.float64)
            if a.shape[0] < 2:
                return False
            d = np.diff(a)
            step = (a[-1] - a[0]) / (a.shape[0] - 1)
            return bool(np.allclose(d, step, rtol=1e-6, atol=0.0))
        self.uniform = tuple(_is_uniform(a) for a in axes)
        if rowgather:
            assert len(self.axes) == 2 and self.values.ndim == 2
            assert all(self.uniform), "rowgather requires uniform axes"
        self.rowgather = bool(rowgather)

    def tree_flatten(self):
        return (self.axes, self.values), (self.extrap, self.dense,
                                          self.rowgather)

    @classmethod
    def tree_unflatten(cls, aux, children):
        axes, values = children
        obj = cls.__new__(cls)
        obj.axes = tuple(axes)
        obj.values = values
        obj.extrap = aux[0]
        obj.dense = aux[1] if len(aux) > 1 else False
        obj.rowgather = aux[2] if len(aux) > 2 else False
        obj.uniform = (False,) * len(obj.extrap)
        return obj

    # ------------------------------------------------------- dense (no gather)

    @staticmethod
    def _static(ax):
        """Concrete numpy view of an axis, or None if it is a tracer."""
        try:
            return np.asarray(ax)
        except Exception:
            return None

    def _hat_weights_static(self, x, a, mode):
        """_hat_weights against a CONCRETE axis: every axis-derived value is
        baked as a literal/numpy constant, so no slicing, gathers or
        scatters appear in the trace (required for the Pallas megakernel,
        where none of those lower to Mosaic)."""
        a = np.asarray(a, np.float64)
        n = a.shape[0]
        cst = lambda v: jnp.asarray(np.asarray(v), x.dtype)
        if mode == "flat":
            x = jnp.clip(x, float(a[0]), float(a[-1]))
        d = np.diff(a)
        dl = cst(np.concatenate([d[:1], d]))
        dr = cst(np.concatenate([d, d[-1:]]))
        t = x[..., None] - cst(a)
        up = t / dl
        down = -t / dr
        w = jnp.minimum(1.0 + jnp.minimum(up, 0.0),
                        1.0 + jnp.minimum(down, 0.0))
        if mode == "flat":
            return jnp.maximum(w, 0.0)
        # 'line': edge hats extrapolate linearly; masked writes become
        # where-selects against constant one-hot masks. Comparisons happen
        # AFTER the f32 unit-append: reshaping an i1 vector does not lower
        # in Mosaic.
        w = jnp.maximum(w, 0.0)
        xe = x[..., None]
        below = xe < float(a[0])
        above = xe > float(a[-1])
        t0 = (xe - float(a[0])) / float(a[1] - a[0])
        tn = (xe - float(a[-2])) / float(a[-1] - a[-2])
        idx = np.arange(n)
        m0, m1 = idx == 0, idx == 1
        mm2, mm1 = idx == n - 2, idx == n - 1
        w = jnp.where(jnp.logical_and(below, m0), 1.0 - t0, w)
        w = jnp.where(jnp.logical_and(below, m1), t0, w)
        w = jnp.where(jnp.logical_and(above, mm2), 1.0 - tn, w)
        w = jnp.where(jnp.logical_and(above, mm1), tn, w)
        return w

    def _hat_weights(self, x, ax, mode):
        """(batch, n) piecewise-linear hat-basis weights such that
        w @ knots reproduces linear interpolation. Gather-free: pure
        broadcasting against the knot vector — on TPU this fuses into large
        elementwise kernels + one small MXU contraction instead of
        fusion-breaking gathers."""
        a_np = self._static(ax)
        if a_np is not None:
            return self._hat_weights_static(x, a_np, mode)
        n = ax.shape[0]
        if mode == "flat":
            x = jnp.clip(x, ax[0], ax[-1])
        # segment widths; pad ends (values irrelevant beyond clamp for flat;
        # for 'line' the edge hats extrapolate linearly by construction)
        dl = jnp.concatenate([ax[1:2] - ax[0:1], ax[1:] - ax[:-1]])   # left
        dr = jnp.concatenate([ax[1:] - ax[:-1], ax[-1:] - ax[-2:-1]])  # right
        t = x[..., None] - ax  # (batch, n)
        up = t / dl            # rising edge from knot k-1 to k
        down = -t / dr         # falling edge from knot k to k+1
        w = jnp.minimum(1.0 + jnp.minimum(up, 0.0), 1.0 + jnp.minimum(down, 0.0))
        if mode == "flat":
            w = jnp.maximum(w, 0.0)
        else:
            # 'line': allow the two edge hats to extrapolate linearly; the
            # interior hats stay clamped at 0
            w_int = jnp.maximum(w, 0.0)
            below = x < ax[0]
            above = x > ax[-1]
            t0 = (x - ax[0]) / (ax[1] - ax[0])
            tn = (x - ax[-2]) / (ax[-1] - ax[-2])
            w_int = w_int.at[..., 0].set(
                jnp.where(below, 1.0 - t0, w_int[..., 0]))
            w_int = w_int.at[..., 1].set(
                jnp.where(below, t0, w_int[..., 1]))
            w_int = w_int.at[..., -2].set(
                jnp.where(above, 1.0 - tn, w_int[..., -2]))
            w_int = w_int.at[..., -1].set(
                jnp.where(above, tn, w_int[..., -1]))
            w = w_int
        return w

    def _call_dense_static(self, coords):
        """Dense evaluation against CONCRETE tables with zero traced
        reshapes: the flattened value matrix and the per-axis expand/reduce
        0/1 matrices are prebuilt in numpy, every contraction is a plain
        (B, n) x (n, R) matmul or an elementwise FMA. This is the form that
        lowers inside the Pallas megakernel (Mosaic rejects minor-dim shape
        casts) and it is MXU-friendly everywhere else too."""
        V = np.asarray(self.values)
        axes_np = [np.asarray(a) for a in self.axes]
        live = []
        for x, a, mode in zip(coords, axes_np, self.extrap):
            if a.shape[0] == 1:
                V = V[(slice(None),) * len(live) + (0,)]
            else:
                live.append((jnp.asarray(x), a, mode))
        tail = V.shape[len(live):]
        if not live:
            x0 = jnp.asarray(coords[0])
            return jnp.broadcast_to(jnp.asarray(V, x0.dtype),
                                    x0.shape + tail)
        xs = jnp.broadcast_arrays(*[x for x, _, _ in live])
        dt = xs[0].dtype
        R_tail = int(np.prod(tail, dtype=np.int64)) if tail else 1

        if not _KRON_STATIC:
            # Sequential contraction with free reshapes: one MXU matmul for
            # axis 0, then a broadcast-multiply-reduce per remaining axis.
            # Materializes only the shrinking (B, rest) partials — the kron
            # form re-materializes a full-width (B, R) product per axis.
            batch = xs[0].shape
            nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
            # (measured negative: the JOINT multi-axis outer-product weight
            # + elementwise reduce for tiny tables was 1.6x SLOWER overall —
            # the matmul form below feeds the MXU while the VPU runs
            # neighbors. The _VPU_MAX_R branch below is narrower: it rewrites
            # ONLY the first-axis contraction, not the joint weight.)
            w = self._hat_weights_static(xs[0], live[0][1], live[0][2])
            V2 = jnp.asarray(V.reshape(V.shape[0], -1), dt)
            if V2.shape[1] <= _VPU_MAX_R:
                # tiny output width: VPU mul+reduce fuses with the hat
                # weights; the MXU matvec would pad to 128x128 tiles and
                # materialize w as a standalone operand (see _VPU_MAX_R)
                out = jnp.sum(
                    w.reshape(nb, V.shape[0], 1) * V2, axis=-2)
            else:
                # ONE 2-D (nb, n0) x (n0, R) matmul: the batched
                # (B..., 1, n0) x (n0, R) form lowers to an M=1-per-lane dot
                # that wastes the MXU (measured 57 us/step at batch 4096; the
                # flat form is a single well-tiled contraction)
                out = jnp.matmul(w.reshape(nb, V.shape[0]), V2,
                                 precision=_PRECISION)
            rest = V.shape[1:]
            for i in range(1, len(live)):
                wi = self._hat_weights_static(xs[i], live[i][1], live[i][2])
                n_i = rest[0]
                rest = rest[1:]
                r = int(np.prod(rest, dtype=np.int64)) if rest else 1
                out = out.reshape(nb, n_i, r)
                out = jnp.sum(out * wi.reshape(nb, n_i)[..., None], axis=-2)
            return out.reshape(batch + tail) if tail else \
                out.reshape(batch)

        # axis 0: hat weights x flattened table
        x0, a0, m0 = xs[0], live[0][1], live[0][2]
        w = self._hat_weights_static(x0, a0, m0)           # (B..., n0)
        V2 = jnp.asarray(V.reshape(V.shape[0], -1), dt)    # (n0, R)
        out = jnp.matmul(w[..., None, :], V2,
                         precision=_PRECISION)[..., 0, :]

        # remaining axes: expand weights across the inner block with a
        # constant 0/1 kron matrix, FMA, reduce with its transpose partner
        inner = [int(np.prod([live[j][1].shape[0]
                              for j in range(i + 1, len(live))],
                             dtype=np.int64)) * R_tail
                 for i in range(len(live))]
        for i in range(1, len(live)):
            x, a, mode = xs[i], live[i][1], live[i][2]
            n, r = a.shape[0], inner[i]
            w = self._hat_weights_static(x, a, mode)       # (B..., n)
            K = jnp.asarray(np.kron(np.eye(n), np.ones((1, r))), dt)
            S = jnp.asarray(np.kron(np.ones((n, 1)), np.eye(r)), dt)
            w_exp = jnp.matmul(w[..., None, :], K,
                               precision=_PRECISION)[..., 0, :]
            out = jnp.matmul((out * w_exp)[..., None, :], S,
                             precision=_PRECISION)[..., 0, :]

        if not tail:
            return out[..., 0]
        if len(tail) == 1:
            return out
        return out.reshape(xs[0].shape + tail)  # rare: multi-dim values

    def _call_dense(self, coords):
        if (self._static(self.values) is not None
                and all(self._static(a) is not None for a in self.axes)):
            return self._call_dense_static(coords)
        coords = jnp.broadcast_arrays(*[jnp.asarray(c) for c in coords])
        batch_shape = coords[0].shape
        nb = len(batch_shape)

        # drop degenerate axes up front (static index, free)
        vals = self.values
        live, k = [], 0
        for x, ax, mode in zip(coords, self.axes, self.extrap):
            if ax.shape[0] == 1:
                # static basic indexing (NOT jnp.take: take lowers to a
                # gather even for a constant index, which Mosaic rejects)
                vals = vals[(slice(None),) * k + (0,)]
            else:
                live.append((x, ax, mode))
                k += 1

        if not live:
            return jnp.broadcast_to(vals, batch_shape + vals.shape)

        out = None
        for idx, (x, ax, mode) in enumerate(live):
            w = self._hat_weights(x, ax, mode)  # (*batch, n)
            if out is None:
                # (B..., 1, n0) x (n0, R) -> (B..., 1, R) on the MXU. The
                # explicit singleton keeps the lhs non-contracting dims
                # non-empty — a bare vector-matrix dot hits a Mosaic
                # dot_dimension_numbers parser bug inside Pallas kernels.
                n0 = vals.shape[0]
                w2 = w.reshape(batch_shape + (1, n0))
                v2 = vals.reshape(n0, -1)
                out = jnp.matmul(w2, v2,
                                 precision=_PRECISION)
                out = out.reshape(batch_shape + vals.shape[1:])
            else:
                # out: (*batch, n_idx, rest...) ; contract axis nb with w
                w_exp = w.reshape(batch_shape + (w.shape[-1],)
                                  + (1,) * (out.ndim - nb - 1))
                out = jnp.sum(out * w_exp, axis=nb)
        return out

    def _call_rowgather(self, coords):
        """2-D uniform-grid bilinear via two contiguous ROW gathers + a
        hat-weight reduction over the second axis. Per-element gathers from a
        large table are the single slowest op pattern on TPU (~0.75 ms for a
        (4096,) query into 721x1441); row gathers are big contiguous DMA
        slices and the reduction fuses into elementwise kernels."""
        x0, x1 = jnp.broadcast_arrays(*[jnp.asarray(c) for c in coords])
        a0, a1 = self.axes
        n0, n1 = a0.shape[0], a1.shape[0]
        d0 = (a0[-1] - a0[0]) / (n0 - 1)
        d1 = (a1[-1] - a1[0]) / (n1 - 1)

        i0 = jnp.clip(jnp.floor((x0 - a0[0]) / d0).astype(jnp.int32), 0, n0 - 2)
        w0 = (x0 - a0[0]) / d0 - i0
        if self.extrap[0] == "flat":
            w0 = jnp.clip(w0, 0.0, 1.0)

        # full-row gathers: (B,) indices with (1, n1) slices lower to
        # contiguous DMA and run ~15x faster than per-element or windowed
        # multi-start gathers on TPU (both measured)
        rows_lo = self.values[i0]        # (B, n1)
        rows_hi = self.values[i0 + 1]
        row = rows_lo * (1.0 - w0)[..., None] + rows_hi * w0[..., None]

        t1 = (x1 - a1[0]) / d1
        if self.extrap[1] == "flat":
            t1 = jnp.clip(t1, 0.0, n1 - 1.0)
        k = jnp.arange(n1, dtype=row.dtype)
        w1 = jnp.maximum(0.0, 1.0 - jnp.abs(t1[..., None] - k))
        return jnp.sum(row * w1, axis=-1)

    def __call__(self, *coords):
        """Evaluate at query point(s). Each coord broadcasts; returns array of
        batch shape + trailing value dims."""
        assert len(coords) == len(self.axes)
        if getattr(self, "rowgather", False):
            return self._call_rowgather(coords)
        if self.dense:
            return self._call_dense(coords)
        coords = jnp.broadcast_arrays(*[jnp.asarray(c) for c in coords])
        batch_shape = coords[0].shape

        idxs, wgts = [], []
        for x, ax, mode, uni in zip(coords, self.axes, self.extrap,
                                    self.uniform):
            n = ax.shape[0]
            if n == 1:
                idxs.append(jnp.zeros(batch_shape, dtype=jnp.int32))
                wgts.append(jnp.zeros(batch_shape, dtype=self.values.dtype))
                continue
            if uni:
                dx = (ax[-1] - ax[0]) / (n - 1)
                i = jnp.clip(jnp.floor((x - ax[0]) / dx).astype(jnp.int32),
                             0, n - 2)
                w = (x - ax[0]) / dx - i
            else:
                i = jnp.clip(jnp.searchsorted(ax, x, side="right") - 1,
                             0, n - 2)
                x0 = jnp.take(ax, i)
                x1 = jnp.take(ax, i + 1)
                w = (x - x0) / (x1 - x0)
            if mode == "flat":
                w = jnp.clip(w, 0.0, 1.0)
            idxs.append(i.astype(jnp.int32))
            wgts.append(w.astype(self.values.dtype))

        d = len(self.axes)
        out = None
        for corner in range(1 << d):
            idx = []
            w = jnp.ones(batch_shape, dtype=self.values.dtype)
            for k in range(d):
                hi = (corner >> k) & 1
                n = self.axes[k].shape[0]
                if n == 1:
                    idx.append(idxs[k])
                    if hi:
                        w = None
                        break
                    continue
                idx.append(idxs[k] + hi)
                w = w * (wgts[k] if hi else (1.0 - wgts[k]))
            if w is None:
                continue
            v = self.values[tuple(idx)]
            v = v * w.reshape(batch_shape + (1,) * (v.ndim - len(batch_shape)))
            out = v if out is None else out + v
        return out


def eval_bundle(queries):
    """Evaluate many small dense static `Lookup`s in ONE MXU matmul.

    `queries` is a sequence of `(lookup, coords)` pairs where every lookup
    has concrete (non-traced) axes and values. Returns a list of outputs
    aligned with `queries`, each of shape `batch + tail` where `batch` is
    the COMMON broadcast of every query's batch shape (one weight matrix,
    one matmul — a scalar query bundled with batched ones broadcasts up;
    values equal the standalone `lookup(*coords)` call either way).

    Why: the fleet step is fixed-overhead-bound, not traffic-bound
    (docs/notes/performance.md — ~0.6% of the HBM roofline, ~425 sequential
    fusion kernels x ~0.4 us). N separate table lookups pay N matmul
    kernels plus their producer fusions. This bundles them: each table's
    joint corner-weight vector (the outer product of its per-axis hat
    weights — a few fused VPU ops) is concatenated into one wide weight
    matrix and contracted once against a block-diagonal value matrix:

        out = concat_j(w_joint_j) @ blockdiag_j(V_j)
              # (B, sum N_j) x (sum N_j, sum R_j)

    Off-block entries are exact 0.0, so each output column equals the
    standalone matmul up to summation order (agreement verified to f64
    roundoff in tests/test_interp_bundle.py). NOTE the distinction from
    the measured-negative "joint outer-product weight + elementwise
    reduce" form (performance.md): this keeps the contraction on the MXU
    and removes N-1 matmul kernels rather than trading the MXU for the VPU.

    Tables whose live coordinates depend on another table's OUTPUT cannot
    share a bundle (e.g. piston `pi_wot(n, delta_wot(n, mu))`); split the
    chain into dependency stages and bundle within each stage.
    """
    if _KRON_STATIC:
        # Mosaic trace (ops.mathx.mosaic_safe): the bundle's minor-dim
        # reshapes/concat don't lower — evaluate per-table via the kron
        # contraction instead (correctness path; the Pallas cluster
        # kernels were measured slower than XLA anyway)
        return [lk(*coords) for lk, coords in queries]

    n_q = len(queries)
    outs = [None] * n_q
    live_w = []      # per bundled query: (index, joint weight (B..., N))
    live_v = []      # per bundled query: V flattened to (N, R) numpy
    live_tail = []   # per bundled query: tail shape tuple
    consts = []      # per constant query: (index, V numpy, tail, dtype)

    for qi, (lk, coords) in enumerate(queries):
        V = lk._static(lk.values)
        axes_np = [lk._static(a) for a in lk.axes]
        assert V is not None and all(a is not None for a in axes_np), \
            "eval_bundle requires concrete (non-traced) axes and values"
        assert len(coords) == len(lk.axes)
        V = np.asarray(V)
        live = []
        for x, a, mode in zip(coords, axes_np, lk.extrap):
            if a.shape[0] == 1:
                V = V[(slice(None),) * len(live) + (0,)]
            else:
                live.append((jnp.asarray(x), a, mode))
        tail = V.shape[len(live):]
        if not live:
            consts.append((qi, V, tail, jnp.asarray(coords[0]).dtype))
            continue
        xs = jnp.broadcast_arrays(*[x for x, _, _ in live])
        w = lk._hat_weights_static(xs[0], live[0][1], live[0][2])
        for i in range(1, len(live)):
            wi = lk._hat_weights_static(xs[i], live[i][1], live[i][2])
            w = (w[..., :, None] * wi[..., None, :]).reshape(
                w.shape[:-1] + (w.shape[-1] * wi.shape[-1],))
        live_w.append((qi, w))
        R = int(np.prod(tail, dtype=np.int64)) if tail else 1
        live_v.append(V.reshape(-1, R))
        live_tail.append(tail)

    batch = jnp.broadcast_shapes(
        *[w.shape[:-1] for _, w in live_w],
        *[jnp.shape(c) for _, coords in queries for c in coords])
    for qi, V, tail, dt_c in consts:
        outs[qi] = jnp.broadcast_to(jnp.asarray(V, dt_c), batch + tail)
    if not live_w:
        return outs
    if len(live_w) == 1:
        # degenerate bundle: fall back to the standalone dense path (same
        # matmul; skips the pointless block-diag padding)
        qi, _ = live_w[0]
        lk, coords = queries[qi]
        outs[qi] = jnp.broadcast_to(lk(*coords), batch + live_tail[0])
        return outs

    nb = int(np.prod(batch, dtype=np.int64)) if batch else 1
    dt = jnp.result_type(*[w.dtype for _, w in live_w])
    W = jnp.concatenate(
        [jnp.broadcast_to(w, batch + w.shape[-1:]).reshape(nb, w.shape[-1])
         .astype(dt) for _, w in live_w], axis=1)

    Ns = [v.shape[0] for v in live_v]
    Rs = [v.shape[1] for v in live_v]
    Vb = np.zeros((sum(Ns), sum(Rs)))
    r0 = c0 = 0
    for v in live_v:
        Vb[r0:r0 + v.shape[0], c0:c0 + v.shape[1]] = v
        r0 += v.shape[0]
        c0 += v.shape[1]
    out = jnp.matmul(W, jnp.asarray(Vb, dt), precision=_PRECISION)

    c0 = 0
    for (qi, _), R, tail in zip(live_w, Rs, live_tail):
        col = out[:, c0:c0 + R]
        c0 += R
        outs[qi] = col.reshape(batch + tail) if tail else \
            col.reshape(batch)
    return outs


def uniform_axis(lo, hi, n):
    """Uniform grid axis (matches Julia `range(lo, hi, n)`)."""
    return jnp.asarray(np.linspace(lo, hi, n))
