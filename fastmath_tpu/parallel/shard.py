"""shard_map wrappers: communication-free batch sharding + psum
reductions.

Design (SURVEY.md §5): every op in this library maps independently over
leading batch dims, so sharding the batch axis over the mesh requires
**no collectives** — each chip runs the identical fused kernel on its
shard. The only communication in the whole library is the final
``psum`` of global reductions. Both are provided here:

* :func:`shard_batch` — lift any batch-mapped op to a sharded op.
* :func:`shard_reduce` — lift a full reduction to shard-local reduce +
  one ``psum`` (ICI within a slice, DCN across).
* :func:`trapprox_sharded` — the stochastic trace estimator with the
  probe axis sharded across chips (probe moments psum-averaged).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import BATCH_AXIS

__all__ = ["shard_batch", "shard_reduce", "trapprox_sharded", "donating"]


def shard_batch(
    fn: Callable,
    mesh: Mesh,
    mesh_axis: str = BATCH_AXIS,
    batch_axes=0,
    out_batch_axes=0,
):
    """Wrap ``fn`` so each array argument is sharded along its batch
    axis over ``mesh_axis`` and the outputs are likewise sharded. The
    body runs unmodified per shard: zero communication.

    ``batch_axes``: int or per-argument tuple of ints (the axis of each
    input that is the batch axis). ``out_batch_axes``: same for outputs.
    """

    def make_spec(ax):
        def spec_for(x):
            s = [None] * jnp.ndim(x)
            a = ax if ax >= 0 else jnp.ndim(x) + ax
            s[a] = mesh_axis
            return P(*s)

        return spec_for

    def wrapped(*args):
        if isinstance(batch_axes, int):
            in_axes = (batch_axes,) * len(args)
        else:
            in_axes = tuple(batch_axes)
        in_specs = tuple(make_spec(ax)(a) for ax, a in zip(in_axes, args))
        out_struct = jax.eval_shape(fn, *args)
        if isinstance(out_batch_axes, int):
            out_specs = jax.tree.map(make_spec(out_batch_axes), out_struct)
        else:
            out_specs = jax.tree.map(
                lambda ax, x: make_spec(ax)(x), tuple(out_batch_axes), out_struct
            )
        # check_vma=False: pallas_call outputs don't carry varying-
        # across-mesh metadata yet, and this wrapper is communication-
        # free by construction (nothing for the checker to validate).
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(*args)

    return wrapped


def shard_reduce(
    reduce_fn: Callable,
    combine: str = "sum",
    mesh: Optional[Mesh] = None,
    mesh_axis: str = BATCH_AXIS,
    batch_axis: int = 0,
):
    """Lift a full reduction ``x -> scalar/small array`` into a sharded
    reduce: shard-local ``reduce_fn`` then one ``psum`` (or psum-based
    mean) across chips.

    ``combine='sum'``: results add (sum-like reductions).
    ``combine='concat_stat'``: reduce_fn returns per-shard (sum, count)
    pairs and the wrapper returns sum/count (mean-like with NaN
    weights).
    """
    if mesh is None:
        raise ValueError("mesh is required")

    def wrapped(x):
        spec = [None] * jnp.ndim(x)
        spec[batch_axis] = mesh_axis
        in_spec = P(*spec)

        if combine == "sum":

            def body(xs):
                return jax.lax.psum(reduce_fn(xs), mesh_axis)

            return jax.shard_map(
                body, mesh=mesh, in_specs=(in_spec,), out_specs=P()
            )(x)

        if combine == "mean_weighted":

            def body(xs):
                num, den = reduce_fn(xs)
                num = jax.lax.psum(num, mesh_axis)
                den = jax.lax.psum(den, mesh_axis)
                return num / den

            return jax.shard_map(
                body, mesh=mesh, in_specs=(in_spec,), out_specs=P()
            )(x)

        raise ValueError(f"unknown combine {combine!r}")

    return wrapped


def trapprox_sharded(
    matvec,
    shape: Sequence[int],
    mesh: Mesh,
    moments: Optional[int] = None,
    samples: int = 10,
    method: str = "rademacher",
    key: Optional[jax.Array] = None,
    dtype=None,
    mesh_axis: str = BATCH_AXIS,
):
    """Hutchinson trace estimation with the **probe axis sharded across
    chips**: each chip draws and evaluates ``samples / n_chips`` probes,
    and the moment accumulators are combined with one ``psum`` (the
    cross-chip moment accumulation named in SURVEY.md §5).
    """
    from ..ops.stochastic import _as_matvec, _sample

    mv, shape, dtype = _as_matvec(matvec, shape, dtype)
    if key is None:
        key = jax.random.key(0)
    n_chips = mesh.shape[mesh_axis]
    per_chip = -(-samples // n_chips)  # ceil
    no_moments = moments is None
    nmom = moments or 1
    import numpy as np

    numel = int(np.prod(tuple(shape)))
    keys = jax.random.split(key, n_chips)

    def body(keys_shard):
        k = keys_shard[0]
        probes = _sample(k, method, (per_chip, numel), dtype)
        mv_flat = lambda x: mv(x.reshape(tuple(shape))).reshape(-1)

        def one(v):
            m = v
            outs = []
            for _ in range(nmom):
                m = mv_flat(m)
                outs.append(jnp.dot(m, v))
            return jnp.stack(outs)

        local = jnp.sum(jax.vmap(one)(probes), axis=0)
        total = jax.lax.psum(local, mesh_axis)
        return total / (per_chip * n_chips)

    t = jax.shard_map(
        body, mesh=mesh, in_specs=(P(mesh_axis),), out_specs=P()
    )(keys)
    return t[0] if no_moments else t


def donating(fn: Callable, argnums=(0,), **jit_kwargs):
    """``jit`` with buffer donation — the TPU-native realization of the
    reference's in-place ``_``-suffixed variants (jitfields
    ``sym_solve_`` / ``sym_addmatvec_`` etc., reference ``sym.py:28-35``;
    SURVEY.md §2 parallelism row 3, "host staging / donation policy").

    The donated operands' HBM is aliased to the outputs by XLA
    (``input_output_alias`` in the compiled executable), so e.g. a
    1M-batch ``sym_solve_`` overwrites the RHS buffer instead of
    allocating a second vector batch::

        solve_ = donating(fastmath_tpu.sym_solve_, argnums=(1,))
        x = solve_(mat, vec)   # vec's buffer is reused; vec is deleted

    ``argnums`` follows ``jax.jit(donate_argnums=...)`` semantics; a
    donated input becomes invalid after the call (``.is_deleted()``).
    Composes with :func:`shard_batch` — donation applies shard-local.
    """
    return jax.jit(fn, donate_argnums=argnums, **jit_kwargs)
