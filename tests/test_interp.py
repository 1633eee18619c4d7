import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops.interp import Lookup


def test_1d_linear_flat():
    xs = jnp.asarray([0.0, 1.0, 3.0])
    ys = jnp.asarray([0.0, 2.0, 4.0])
    f = Lookup((xs,), ys, extrap="flat")
    np.testing.assert_allclose(f(jnp.asarray(0.5)), 1.0)
    np.testing.assert_allclose(f(jnp.asarray(2.0)), 3.0)
    np.testing.assert_allclose(f(jnp.asarray(-5.0)), 0.0)   # flat extrap
    np.testing.assert_allclose(f(jnp.asarray(10.0)), 4.0)


def test_1d_line_extrap():
    xs = jnp.asarray([0.0, 1.0])
    ys = jnp.asarray([0.0, 2.0])
    f = Lookup((xs,), ys, extrap="line")
    np.testing.assert_allclose(f(jnp.asarray(2.0)), 4.0)
    np.testing.assert_allclose(f(jnp.asarray(-1.0)), -2.0)


def test_2d_bilinear():
    xs = jnp.asarray([0.0, 1.0])
    ys = jnp.asarray([0.0, 1.0, 2.0])
    V = jnp.asarray([[0.0, 1.0, 2.0],
                     [10.0, 11.0, 12.0]])
    f = Lookup((xs, ys), V)
    np.testing.assert_allclose(f(0.5, 0.5), 5.5)
    np.testing.assert_allclose(f(0.25, 1.5), 4.0)
    # exact at nodes
    np.testing.assert_allclose(f(1.0, 2.0), 12.0)


def test_vector_valued_and_batched():
    xs = jnp.linspace(0, 1, 5)
    V = jnp.stack([xs, xs**0 * 3.0], axis=-1)  # (5, 2)
    f = Lookup((xs,), V)
    out = f(jnp.asarray([0.1, 0.9]))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[:, 0], [0.1, 0.9], atol=1e-12)
    np.testing.assert_allclose(out[:, 1], 3.0)


def test_jit_vmap_grad():
    xs = jnp.linspace(0.0, 2 * jnp.pi, 200)
    f = Lookup((xs,), jnp.sin(xs))
    g = jax.jit(lambda x: f(x))
    np.testing.assert_allclose(g(jnp.asarray(1.0)), np.sin(1.0), atol=2e-4)
    vm = jax.vmap(f)(jnp.linspace(0.5, 1.5, 8))
    np.testing.assert_allclose(vm, np.sin(np.linspace(0.5, 1.5, 8)), atol=2e-4)
    d = jax.grad(lambda x: f(x))(jnp.asarray(1.0))
    np.testing.assert_allclose(d, np.cos(1.0), atol=1e-2)


def test_nonuniform_3d():
    xs = jnp.asarray([0.0, 0.5, 2.0])
    ys = jnp.asarray([-1.0, 1.0])
    zs = jnp.asarray([0.0, 1.0, 2.0, 4.0])
    X, Ymesh, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    V = 2 * X - 3 * Ymesh + 0.5 * Z  # trilinear function is exactly reproduced
    f = Lookup((xs, ys, zs), V)
    pts = [(0.3, 0.2, 3.1), (1.7, -0.5, 0.2)]
    for x, y, z in pts:
        np.testing.assert_allclose(f(x, y, z), 2 * x - 3 * y + 0.5 * z, atol=1e-12)


def test_dense_matches_gather_randomized():
    """Gather-free (hat-basis/MXU) evaluation must agree exactly with the
    gather path for every dimension/extrapolation combination, inside and
    outside the grid."""
    import numpy as np
    import jax.numpy as jnp
    from flightjax.ops.interp import Lookup

    rng = np.random.default_rng(0)
    for _ in range(30):
        d = int(rng.integers(1, 4))
        axes = [np.sort(rng.uniform(-2, 2, int(rng.integers(2, 9))))
                for _ in range(d)]
        if rng.random() < 0.3:
            axes[int(rng.integers(0, d))] = np.array([0.5])
        trailing = (3,) if rng.random() < 0.5 else ()
        vals = rng.normal(size=tuple(len(a) for a in axes) + trailing)
        extrap = tuple(rng.choice(["flat", "line"]) for _ in range(d))
        lg = Lookup(axes, vals, extrap, dense=False)
        ld = Lookup(axes, vals, extrap, dense=True)
        q = [jnp.asarray(rng.uniform(-3, 3, 17)) for _ in range(d)]
        np.testing.assert_allclose(np.asarray(lg(*q)), np.asarray(ld(*q)),
                                   rtol=1e-12, atol=1e-12)


def test_dense_static_kron_vs_reshape_paths():
    """The Mosaic-safe kron-matmul contraction and the plain-XLA reshape
    contraction of `_call_dense_static` are the same multilinear map —
    exercised across dims, degenerate axes, trailing value dims, both
    extrapolation modes, and multi-dim query batches."""
    import numpy as np
    import jax.numpy as jnp
    import flightjax.ops.interp as interp
    from flightjax.ops.interp import Lookup

    rng = np.random.default_rng(7)
    saved = interp._KRON_STATIC
    try:
        for trial in range(12):
            d = int(rng.integers(1, 5))
            axes = [np.sort(rng.uniform(-3, 3, int(rng.integers(2, 8))))
                    for _ in range(d)]
            if rng.random() < 0.3:
                axes[int(rng.integers(0, d))] = np.array([0.5])
            tail = (int(rng.integers(2, 7)),) if trial % 2 else ()
            vals = rng.standard_normal(tuple(len(a) for a in axes) + tail)
            extrap = tuple(rng.choice(["flat", "line"]) for _ in range(d))
            lk = Lookup(axes, vals, extrap=extrap, dense=True)
            shp = (37,) if trial % 3 else (5, 7)
            q = [jnp.asarray(rng.uniform(-4, 4, shp)) for _ in range(d)]
            interp._KRON_STATIC = True
            a = np.asarray(lk(*q))
            interp._KRON_STATIC = False
            b = np.asarray(lk(*q))
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    finally:
        interp._KRON_STATIC = saved


def test_dense_static_vpu_reduce_matches_matmul():
    """The `_VPU_MAX_R` broadcast-multiply-reduce form of the first-axis
    contraction is the same linear map as the MXU matmul form, across dims,
    tails, extrapolation modes, and batch shapes (f64 here, so exact to
    reassociation roundoff)."""
    import flightjax.ops.interp as interp
    from flightjax.ops.interp import Lookup

    rng = np.random.default_rng(11)
    saved = interp._VPU_MAX_R
    try:
        for trial in range(10):
            d = int(rng.integers(1, 4))
            axes = [np.sort(rng.uniform(-3, 3, int(rng.integers(2, 8))))
                    for _ in range(d)]
            tail = (int(rng.integers(2, 5)),) if trial % 2 else ()
            vals = rng.standard_normal(tuple(len(a) for a in axes) + tail)
            extrap = tuple(rng.choice(["flat", "line"]) for _ in range(d))
            lk = Lookup(axes, vals, extrap=extrap, dense=True)
            shp = (23,) if trial % 3 else (4, 5)
            q = [jnp.asarray(rng.uniform(-4, 4, shp)) for _ in range(d)]
            interp._VPU_MAX_R = 0
            a = np.asarray(lk(*q))
            interp._VPU_MAX_R = 1 << 20   # force the reduce form everywhere
            b = np.asarray(lk(*q))
            assert a.shape == b.shape
            np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
    finally:
        interp._VPU_MAX_R = saved


def test_mosaic_safe_toggles_kron_path():
    import flightjax.ops.interp as interp
    from flightjax.ops.mathx import mosaic_safe

    assert interp._KRON_STATIC is False
    with mosaic_safe():
        assert interp._KRON_STATIC is True
    assert interp._KRON_STATIC is False


def test_eval_bundle_matches_standalone_randomized():
    """`eval_bundle` (one block-diagonal MXU matmul for many tables) must
    agree with per-table standalone evaluation to f64 roundoff across
    dims, extrapolation modes, degenerate axes, trailing value dims, and
    mixed batch shapes (incl. scalar queries broadcasting against batched
    ones)."""
    from flightjax.ops.interp import eval_bundle

    rng = np.random.default_rng(7)
    for trial in range(12):
        n_tables = int(rng.integers(2, 7))
        queries = []
        for _ in range(n_tables):
            d = int(rng.integers(1, 4))
            axes = [np.sort(rng.uniform(-2, 2, int(rng.integers(2, 9))))
                    for _ in range(d)]
            if rng.random() < 0.25:
                axes[int(rng.integers(0, d))] = np.array([0.5])
            trailing = (int(rng.integers(2, 5)),) if rng.random() < 0.4 else ()
            vals = rng.normal(size=tuple(len(a) for a in axes) + trailing)
            extrap = tuple(rng.choice(["flat", "line"]) for _ in range(d))
            lk = Lookup(axes, vals, extrap, dense=True)
            # mix batched and scalar coords; queries land in- and out-of-grid
            coords = tuple(
                jnp.asarray(rng.uniform(-3, 3, 17)) if rng.random() < 0.8
                else jnp.asarray(rng.uniform(-3, 3))
                for _ in range(d))
            queries.append((lk, coords))
        bundled = eval_bundle(queries)
        # outputs broadcast to the COMMON batch of the whole bundle
        batch = jnp.broadcast_shapes(
            *[jnp.broadcast_shapes(*[jnp.shape(c) for c in coords])
              for _, coords in queries])
        for (lk, coords), got in zip(queries, bundled):
            want = lk(*coords)
            tail = want.shape[len(jnp.broadcast_shapes(
                *[jnp.shape(c) for c in coords])):]
            want = jnp.broadcast_to(want, batch + tail)
            assert got.shape == want.shape
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-12, atol=1e-12)


def test_eval_bundle_single_and_constant():
    """Degenerate bundles: a single live table falls back to the standalone
    path; an all-degenerate-axes table broadcasts its constant."""
    from flightjax.ops.interp import eval_bundle

    lk = Lookup([np.array([0.0, 1.0])], np.array([1.0, 3.0]))
    (out,) = eval_bundle([(lk, (jnp.asarray([0.5, 0.25]),))])
    np.testing.assert_allclose(np.asarray(out), [2.0, 1.5])

    const = Lookup([np.array([0.5])], np.array([7.0]))
    outs = eval_bundle([(const, (jnp.asarray([1.0, 2.0, 3.0]),)),
                        (lk, (jnp.asarray([0.5, 0.25, 1.0]),))])
    np.testing.assert_allclose(np.asarray(outs[0]), [7.0, 7.0, 7.0])
    np.testing.assert_allclose(np.asarray(outs[1]), [2.0, 1.5, 3.0])


def test_eval_bundle_jit_grad():
    """Bundled evaluation works under jit and is differentiable."""
    from flightjax.ops.interp import eval_bundle

    a = Lookup([np.array([0.0, 1.0, 2.0])], np.array([0.0, 1.0, 4.0]))
    b = Lookup([np.array([0.0, 2.0])], np.array([[1.0, 2.0], [3.0, 4.0]]))

    def f(x):
        oa, ob = eval_bundle([(a, (x,)), (b, (x,))])
        return oa + jnp.sum(ob, axis=-1)

    x = jnp.asarray([0.5, 1.5])
    np.testing.assert_allclose(np.asarray(jax.jit(f)(x)),
                               np.asarray(f(x)), rtol=1e-12)
    g = jax.grad(lambda x: jnp.sum(f(x)))(x)
    # d/dx of a: 1 on [0,1], 3 on [1,2]; of sum(b): (2-1)+(4-2) = wrong —
    # b rows are knots: sum(b) goes 3 -> 7 over x in [0,2] => slope 2
    np.testing.assert_allclose(np.asarray(g), [1.0 + 2.0, 3.0 + 2.0],
                               rtol=1e-12)


pytestmark = pytest.mark.fast
