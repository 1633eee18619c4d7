"""Hierarchical hybrid (continuous + discrete) modeling protocol, TPU-native.

The reference builds a mutable `Model` tree whose child state vectors alias
slices of the parent's ComponentVector (`modeling.jl:89-159`), with update
protocol `f_init!/f_ode!/f_step!/f_periodic!/f_output!`
(`modeling.jl:196-254`). Here the same protocol becomes *pure functional
composition over pytrees*:

- A **component** is a Python object holding only static configuration
  (shapes, table lookups, physical constants). It provides:

    init_x() / init_u() / init_s()      -> pytrees (or None) of initial
                                           continuous state / input /
                                           discrete state
    f_ode(x, u, s, t, *ctx)             -> (x_dot, y)   pure continuous
                                           dynamics + output
    f_step(x, u, s, t, *ctx)            -> (x, s)       post-integration-step
                                           impulse (renormalization, FSMs)
    f_periodic(x, u, s, t, *ctx)        -> (x, u, s)    scheduled discrete
                                           update at its sampling period

  Composites implement these by calling their children and assembling
  pytrees — the reference's array aliasing becomes plain data flow.

- **Multirate scheduling**: the reference gates a submodel's periodic update
  with `_n % _N == 0` where `_n` counts root periodic firings and `_N` is
  the product of `Subsampled` multipliers down the tree
  (`modeling.jl:68-78,225-228`). Here the root firing index `k` is carried
  by the simulation loop and composites apply `periodic_gate(k, N, fn,
  state)` — a branch-free masked update (`lax.cond` would serialize;
  `jnp.where` keeps everything vectorizable under `vmap`).

All state containers are NamedTuples/pytrees of arrays; everything jits,
vmaps and differentiates.
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


def bscale(c, leaf):
    """`c * leaf` for a scalar-per-lane `c` and any-rank `leaf`, expanding
    c one axis at a time with explicit materialization: under vmap inside a
    Pallas kernel, a direct (or fused stepwise) broadcast lowers to a
    single rank-changing reshape Mosaic rejects; alternating unit appends
    with same-rank broadcast_to keeps every step individually lowerable."""
    extra = jnp.shape(leaf)[jnp.ndim(c):]
    for n in extra:
        c = jnp.broadcast_to(c[..., None], jnp.shape(c) + (n,))
    return c * leaf


def bwhere(pred, a, b):
    """`jnp.where` with a lower-rank bool `pred`, Mosaic-safe. A bool
    minor-dim insertion does not lower inside Pallas kernels ("only
    supported for 32-bit types"), so the rank expansion rides an int32
    mask, expanded one trailing axis at a time like `bscale`, and is
    converted back to bool at full shape. Exact `where` semantics
    (non-selected branch may be non-finite)."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b))
    p = jnp.asarray(pred).astype(jnp.int32)
    for n in shape[jnp.ndim(p):]:
        p = jnp.broadcast_to(p[..., None], jnp.shape(p) + (n,))
    return jnp.where(p != 0, a, b)


def canonical(tree):
    """Strip weak types from every leaf of a pytree (python scalars and
    freshly-minted `jnp.asarray(0.0)` leaves are weakly typed). The hot
    step's jit signature keys on weak_type, so a carry minted with weak
    leaves recompiles once its outputs (strong) feed back in — one wasted
    compile of the most expensive function in the program. Every state
    constructor canonicalizes through here; zero-recompilation is enforced
    by tests/test_compile_contract.py."""
    def strong(l):
        a = jnp.asarray(l)
        return jax.lax.convert_element_type(a, a.dtype) if a.weak_type else a
    return jax.tree.map(strong, tree)


def tree_where(pred, true_tree, false_tree):
    """Elementwise select between two identically-structured pytrees.
    `pred` is a scalar (or broadcastable) boolean. Bool leaves use the
    logical form — a bool-valued select_n does not lower inside Pallas
    kernels (i8 -> i1 truncation)."""
    def sel(t, f):
        if t is f:
            # identity pass-through: where(p, a, a) == a exactly. Beyond
            # saving the select, this keeps untouched scan-carry leaves
            # (e.g. `u` when f_periodic doesn't write it) loop-INVARIANT,
            # so XLA's while-LICM hoists everything derived from them
            # (payload/airframe mass-property transport, sea-level
            # atmosphere, actuation scaling) out of the time loop.
            return t
        if jnp.asarray(t).dtype == jnp.bool_:
            return jnp.logical_or(jnp.logical_and(pred, t),
                                  jnp.logical_and(jnp.logical_not(pred), f))
        return jnp.where(pred, t, f)
    return jax.tree.map(sel, true_tree, false_tree)


def match_vma(tree, ref):
    """Make every leaf of `tree` carry (at least) the varying-manual-axes
    of `ref`'s leaves, via `lax.pcast(..., to='varying')`.

    Under `shard_map`, freshly-minted constants (zeros, identity
    quaternions) are *replicated* over the mesh axes while values derived
    from sharded operands are *varying*; a `lax.cond` whose cheap branch
    builds such constants then fails JAX's VMA branch-type check (the
    fleet-level gear gate is the shipped case). Outside shard_map the vma
    sets are empty and this is an exact no-op."""
    want = frozenset()
    for l in jax.tree.leaves(ref):
        try:
            want = want | jax.typeof(l).vma
        except (AttributeError, TypeError):
            pass
    if not want:
        return tree

    def cast(l):
        try:
            missing = want - jax.typeof(l).vma
        except (AttributeError, TypeError):
            return l
        if not missing:
            return l
        return jax.lax.pcast(l, tuple(missing), to="varying")
    return jax.tree.map(cast, tree)


def periodic_gate(k, N, fn, state):
    """Run `fn(state) -> state` only when root periodic firing index `k` is a
    multiple of `N` (the reference's `Conditional` execution,
    `modeling.jl:225-228`); otherwise pass `state` through unchanged.

    `N == 1` short-circuits statically (the common single-rate case compiles
    with no select at all)."""
    if N == 1:
        return fn(state)
    return tree_where(k % N == 0, fn(state), state)


class Component:
    """Base class with inert defaults: no state, no inputs, no dynamics.
    Subclasses override what they need (the reference's `@no_ode/@no_step/
    @no_periodic` defaults, `modeling.jl:260-277`)."""

    def init_x(self):
        return None

    def init_u(self):
        return None

    def init_s(self):
        return None

    def f_ode(self, x, u, s, t, *ctx):
        return None, None

    def f_step(self, x, u, s, t, *ctx):
        return x, s

    def f_periodic(self, x, u, s, t, *ctx):
        return x, u, s


class Subsampled:
    """Marks a child component as running its periodic update every K parent
    firings. Composites are responsible for honoring `.K` via
    `periodic_gate` with the *root-relative* product of multipliers
    (mirrors `modeling.jl:155-159`)."""

    def __init__(self, component, K: int):
        self.component = component
        self.K = int(K)

    def __getattr__(self, name):
        return getattr(self.component, name)


def tree_repr(tree, name="model", _prefix="", _last=True, _root=True) -> str:
    """Render a state/output pytree as an ASCII tree with array shapes and
    dtypes at the leaves — the functional counterpart of the reference's
    AbstractTrees Model printing (`modeling.jl:341-354`)."""
    import numpy as _np

    connector = "" if _root else ("└─ " if _last else "├─ ")
    if isinstance(tree, dict):
        children = list(tree.items())
    elif hasattr(tree, "_fields"):  # NamedTuple
        children = [(k, getattr(tree, k)) for k in tree._fields]
    else:
        children = None

    if children is None:
        if tree is None:
            desc = "None"
        else:
            arr = _np.asarray(tree)
            desc = (f"{arr.dtype}" if arr.shape == ()
                    else f"{arr.dtype}{list(arr.shape)}")
        return f"{_prefix}{connector}{name}: {desc}\n"

    out = f"{_prefix}{connector}{name}\n"
    child_prefix = _prefix if _root else _prefix + ("   " if _last else "│  ")
    for i, (k, v) in enumerate(children):
        out += tree_repr(v, str(k), child_prefix, i == len(children) - 1,
                         _root=False)
    return out


def print_tree(tree, name="model"):
    """Print a pytree hierarchy (see `tree_repr`)."""
    print(tree_repr(tree, name), end="")
