"""Compact symmetric matrix ops (matvec / solve / invert / det / outer / JHJ).

Capability parity with the reference's ``sym`` module
(``nitorch_fastmath/sym.py`` + ``_impl/sym.py`` + the external
``jitfields.sym`` C++/CUDA kernels). Everything here is a TPU-first
re-design:

* All small-N hot loops are **unrolled at trace time** from the layout
  index map (:mod:`fastmath_tpu.layouts.sym`), producing one fused XLA
  kernel per op — the reference instead launches one TorchScript op per
  scalar step (``_impl/sym.py:87-131``) or calls out to jitfields.
* Solves for N <= 4 use a generic trace-time adjugate (Laplace expansion
  with memoized minors) — numerically equivalent to the reference's
  hand-written Cramer kernels (``_impl/sym.py:194-324``) but generated
  from the index map rather than transcribed.
* N > 4 densifies to full storage and uses ``jnp.linalg`` batched
  routines (reference: ``_impl/sym.py:392-396``).
* Layout auto-detection (scaled identity / diagonal / compact / full,
  contract at reference ``sym.py:16-24``) is static, at trace time.
* A Pallas TPU lane-packed kernel path exists for the very-large-batch
  regime (see :mod:`fastmath_tpu.kernels.sym_pallas`); the functions here
  are the reference/XLA path and the autodiff rules (plain jnp, so JAX
  AD works through everything — the reference's ``sym_solve`` had no
  autograd at all, ``_impl/sym.py:333-335``).

The in-place ``_``-suffixed reference variants (``sym_solve_`` etc.,
``sym.py:28-35``) are provided as aliases: JAX is functional, and buffer
donation + XLA fusion subsume in-place semantics.
"""
from __future__ import annotations

from typing import Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

from ..layouts.sym import (
    MatrixLayout,
    classify_layout,
    compact_size,
    full_to_sym,
    sym_diag,
    sym_dim,
    sym_to_full,
    tri_index,
)

__all__ = [
    "sym_to_full",
    "full_to_sym",
    "sym_diag",
    "sym_outer",
    "sym_det",
    "sym_matmul",
    "sym_matvec",
    "sym_addmatvec",
    "sym_addmatvec_",
    "sym_submatvec",
    "sym_submatvec_",
    "sym_solve",
    "sym_solve_",
    "sym_solve_chain",
    "sym_matvec_chain",
    "sym_maxeig",
    "sym_invert",
    "sym_invert_",
]

# N <= this uses closed-form adjugate solves; above, densify + linalg.
_CLOSED_FORM_MAX = 4
# N <= this uses unrolled elementwise matvec; above, densify + MXU matmul.
_UNROLL_MATVEC_MAX = 8
# N <= this is served by the Pallas native tier (kernels/sym_pallas.py)
_PALLAS_MAX_N = 8
# solve/invert/det reach N <= 32 via the rolled stacked-grid PLU
# (kernels/sym_pallas.py MAX_N_ROLLED; N <= 16 is the BASELINE gate,
# 17..32 matches jitfields' uncapped kernels)
_PALLAS_ROLLED_MAX_N = 32

from ..core.dtypes import downcast as _downcast, upcast_half
from ._routing import nbatch as _nbatch, use_pallas as _use_pallas


def _pallas_supported(layout, n, dtype, n_max=_PALLAS_MAX_N):
    """The native tier serves compact storage, real floats, N <= 8.
    At N == 1 every storage class coincides (NN == 1), so the
    scaled-identity classification is compact too."""
    compact = layout is MatrixLayout.COMPACT_SYM or (
        n == 1 and layout is MatrixLayout.SCALED_IDENTITY
    )
    return (
        compact
        and n <= n_max
        and jnp.issubdtype(jnp.dtype(dtype), jnp.floating)
    )


def _route_compact(backend, layout, n, dtype, batch, n_max=_PALLAS_MAX_N,
                   auto: bool = True):
    """Shared routing decision for the compact-sym ops. ``auto=False``
    marks purely elementwise ops XLA always wins on (matvec family):
    only an explicit ``backend='pallas'`` reaches the kernel."""
    supported = _pallas_supported(layout, n, dtype, n_max)
    if backend == "auto" and not auto:
        return False
    return _use_pallas(
        backend,
        supported=supported,
        batch=batch,
        dtype=dtype,
        small_n=n <= _CLOSED_FORM_MAX,
        why_unsupported=(
            f"pallas tier serves compact-symmetric storage with "
            f"N <= {n_max} and real floating dtypes (got layout="
            f"{layout.name}, N={n}, {jnp.dtype(dtype).name})"
        ),
    )


def _entries(mat: jnp.ndarray, n: int):
    """Full-matrix view of compact storage as an n x n grid of lazy
    last-axis slices (trace-time; each slice is one fused gather)."""
    return [[mat[..., tri_index(i, j, n)] for j in range(n)] for i in range(n)]


# ---------------------------------------------------------------------------
# trace-time generic determinant / adjugate via memoized Laplace expansion
# ---------------------------------------------------------------------------


def _det_expand(E, rows, cols, cache):
    """Determinant of the submatrix E[rows][cols], memoized on the static
    index sets so shared minors are traced once (XLA then fuses/CSEs)."""
    key = (rows, cols)
    if key in cache:
        return cache[key]
    k = len(rows)
    if k == 0:
        out = 1.0  # det of the empty matrix (0x0 minor for n=1)
    elif k == 1:
        out = E[rows[0]][cols[0]]
    elif k == 2:
        out = (
            E[rows[0]][cols[0]] * E[rows[1]][cols[1]]
            - E[rows[0]][cols[1]] * E[rows[1]][cols[0]]
        )
    else:
        out = None
        r0 = rows[0]
        sub_rows = rows[1:]
        for pos, c in enumerate(cols):
            sub_cols = cols[:pos] + cols[pos + 1 :]
            minor = _det_expand(E, sub_rows, sub_cols, cache)
            term = E[r0][c] * minor
            if pos % 2:
                term = -term
            out = term if out is None else out + term
    cache[key] = out
    return out


def _det_full(E, n: int, cache=None):
    cache = {} if cache is None else cache
    idx = tuple(range(n))
    return _det_expand(E, idx, idx, cache)


def _adjugate_apply(E, vec_parts, n: int):
    """Compute (adj(A) @ v, det(A)) with A given by entry grid E.

    For symmetric A the adjugate is symmetric; we still compute
    cofactor(j, i) generally from the index map so the same machinery
    serves full storage if ever needed.
    """
    cache = {}
    idx = tuple(range(n))
    det = _det_expand(E, idx, idx, cache)
    out = []
    for i in range(n):
        acc = None
        for j in range(n):
            # adj[i][j] = cofactor(j, i) = (-1)^{i+j} det(minor(j, i))
            rows = tuple(r for r in idx if r != j)
            cols = tuple(c for c in idx if c != i)
            minor = _det_expand(E, rows, cols, cache)
            term = minor * vec_parts[j]
            if (i + j) % 2:
                term = -term
            acc = term if acc is None else acc + term
        out.append(acc)
    return out, det


# ---------------------------------------------------------------------------
# matvec family
# ---------------------------------------------------------------------------


def _compact_matvec(mat: jnp.ndarray, vec: jnp.ndarray, n: int) -> jnp.ndarray:
    if n > _UNROLL_MATVEC_MAX:
        full = sym_to_full(mat, n)
        return jnp.einsum("...ij,...j->...i", full, vec, precision="highest")
    out = []
    for i in range(n):
        acc = mat[..., i] * vec[..., i]
        for j in range(n):
            if j != i:
                acc = acc + mat[..., tri_index(i, j, n)] * vec[..., j]
        out.append(acc)
    return jnp.stack(out, axis=-1)


def _cf_call(fn, out_channel_axis0, *channel_last_args, **kw):
    """Route a batch-major public call through a channel-first kernel:
    broadcast the batch dims right-aligned (the public contract), then
    feed lazy ``moveaxis(-1, 0)`` views with ``bm=True`` so the kernel's
    block-major repack composes with the transpose into one block-local
    relayout (no global transpose materializes)."""
    batch = np.broadcast_shapes(*(a.shape[:-1] for a in channel_last_args))
    args = [
        jnp.moveaxis(jnp.broadcast_to(a, batch + a.shape[-1:]), -1, 0)
        for a in channel_last_args
    ]
    out = fn(*args, bm=True, **kw)
    return jnp.moveaxis(out, 0, -1) if out_channel_axis0 else out


def sym_matvec(
    mat: jnp.ndarray, vec: jnp.ndarray, backend: str = "auto"
) -> jnp.ndarray:
    """Matrix-vector product ``A @ v`` for auto-detected compact storage.

    ``mat`` has shape ``(..., NN)`` with ``NN`` in ``{1, N, N(N+1)/2,
    N*N}`` (see :func:`fastmath_tpu.layouts.classify_layout`); ``vec`` has
    shape ``(..., N)``. Batch dims broadcast. bf16/f16 inputs compute
    in f32 and round once on output. Reference analog:
    ``_impl/sym.py:134-175`` + jitfields ``sym_matvec``.

    ``backend``: matvec is purely elementwise and memory-bound — fused
    XLA out-streams the Pallas grid (``ops/_routing.py``), so ``auto``
    == ``xla``; ``"pallas"`` forces the native kernel.
    """
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    if _route_compact(backend, layout, n, mat.dtype, _nbatch(mat, vec),
                      auto=False):
        from ..kernels.sym_pallas import sym_matvec_cf

        return _downcast(_cf_call(sym_matvec_cf, True, mat, vec), half)
    return _downcast(_sym_matvec_impl(mat, vec), half)


def _sym_matvec_impl(mat, vec):
    """sym_matvec body without dtype handling (callers did upcast)."""
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    if layout is MatrixLayout.SCALED_IDENTITY or layout is MatrixLayout.DIAGONAL:
        return mat * vec
    if layout is MatrixLayout.FULL:
        full = mat.reshape(*mat.shape[:-1], n, n)
        return jnp.einsum("...ij,...j->...i", full, vec, precision="highest")
    return _compact_matvec(mat, vec, n)


def sym_addmatvec(
    acc: jnp.ndarray, mat: jnp.ndarray, vec: jnp.ndarray,
    backend: str = "auto",
) -> jnp.ndarray:
    """``acc + A @ v`` (fused accumulate; jitfields ``sym_addmatvec``).
    ``backend`` as in :func:`sym_matvec` (elementwise: auto == xla)."""
    acc, mat, vec, half = upcast_half(acc, mat, vec)
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    if _route_compact(backend, layout, n, mat.dtype,
                      _nbatch(acc, mat, vec), auto=False):
        from ..kernels.sym_pallas import sym_addmatvec_cf

        return _downcast(_cf_call(sym_addmatvec_cf, True, acc, mat, vec),
                         half)
    return _downcast(acc + _sym_matvec_impl(mat, vec), half)


def sym_submatvec(
    acc: jnp.ndarray, mat: jnp.ndarray, vec: jnp.ndarray,
    backend: str = "auto",
) -> jnp.ndarray:
    """``acc - A @ v`` (fused subtract-accumulate; jitfields
    ``sym_submatvec``). ``backend`` as in :func:`sym_matvec`."""
    acc, mat, vec, half = upcast_half(acc, mat, vec)
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    if _route_compact(backend, layout, n, mat.dtype,
                      _nbatch(acc, mat, vec), auto=False):
        from ..kernels.sym_pallas import sym_submatvec_cf

        return _downcast(_cf_call(sym_submatvec_cf, True, acc, mat, vec),
                         half)
    return _downcast(acc - _sym_matvec_impl(mat, vec), half)


# ---------------------------------------------------------------------------
# solve / invert / det
# ---------------------------------------------------------------------------


def _apply_eps(diag_parts, eps, n, dtype):
    """Add the reference's diagonal smoothing term (``_impl/sym.py:377-382``):
    scalar or per-channel sequence, last value broadcast to length n."""
    eps = np.asarray(eps, dtype=np.float64).ravel()
    if eps.size < n:
        eps = np.concatenate([eps, np.full(n - eps.size, eps[-1])])
    return [d + jnp.asarray(eps[i], dtype=dtype) for i, d in enumerate(diag_parts)]


def sym_solve(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    eps: Optional[Union[float, Sequence[float]]] = None,
    refine: Optional[int] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    r"""Left matrix division ``A \ v`` for auto-detected compact storage.

    Orders up to 4 are solved in closed form (trace-time adjugate; one
    fused XLA kernel); larger orders use an unrolled pivoted LU. ``eps``
    adds a smoothing term to the diagonal before solving. Reference
    analog: ``_impl/sym.py:327-398`` + jitfields ``sym_solve``. Unlike
    the reference (no autograd, ``_impl/sym.py:333``), this is fully
    differentiable. bf16/f16 inputs compute in f32 and round once on
    output (closed-form solves lose all significance in half precision).

    ``backend="auto"`` dispatches compact real-float input to the
    Pallas native tier on TPU in the regimes where it wins: always at
    5 <= N <= 8 (~39x the fused-XLA PLU, ``BENCH_MEASURED.md``), and at
    N <= 4 only for very large (>= 8M) unchained batches — a chained
    ``lax.scan`` of dependent N <= 4 solves saturates bandwidth on the
    fused-XLA path already (``bench.py``'s 6.6e9 solves/s headline).
    ``"pallas"``/``"xla"`` force a path; both are differentiable.

    ``refine`` adds iterative-refinement steps ``x += A \ (v - A x)``
    (fp32 tail sharpening for ill-conditioned matrices). Default: 0 on
    the fused-XLA paths — the Wishart-class normwise error is already
    ~2e-7 without it, and a refinement step doubles the FLOPs of the
    chained `lax.scan` workload, which is compute-limited at the
    sustained rate (measured: 6.6e9 -> 2.9e9 solves/s with refine=1) —
    and 1 on the single-dispatch Pallas N <= 4 kernel, where the
    operands are register-resident and the step is bandwidth-free.
    """
    mat, vec, half = upcast_half(mat, vec)
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    if _route_compact(backend, layout, n, mat.dtype, _nbatch(mat, vec),
                      n_max=_PALLAS_ROLLED_MAX_N):
        from ..kernels.sym_pallas import sym_solve_cf

        return _downcast(
            _cf_call(sym_solve_cf, True, mat, vec, eps=eps, refine=refine),
            half,
        )
    return _downcast(_sym_solve_impl(mat, vec, eps,
                                     int(refine or 0)), half)


def sym_solve_chain(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    iters: int = 1,
    add: Optional[jnp.ndarray] = None,
    eps: Optional[Union[float, Sequence[float]]] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    r"""Iterated left division: ``x_0 = vec``, ``x_{t+1} = A \ x_t``
    (``+ add`` when given); returns ``x_iters``.

    The sustained form of :func:`sym_solve` for iterative workloads
    (fixed-point / Richardson-type recurrences — cf. the reference's
    ``meanm`` loop, reference ``lie.py:76-91``, which re-launches the
    solve per step). Extension op: the reference has no fused
    iteration.

    ``backend="auto"`` routes to the fused Pallas chain kernel on TPU
    (:func:`fastmath_tpu.kernels.sym_solve_chain_cf`): each matrix
    block and its loop-invariant solve machinery (cofactor grid +
    1/det for N <= 4, packed pivoted-LU factorization for
    5 <= N <= 8 — factor once, solve many) stays in VMEM/registers
    across all ``iters`` iterations, so HBM traffic per solve is
    ~(NN+3N)*4/iters bytes and the chain runs VPU-compute-bound
    instead of at the stream/dispatch bound that caps a ``lax.scan``
    of :func:`sym_solve` (``BENCH_MEASURED.md``). ``backend="xla"``
    runs exactly that scan. Both are differentiable (the kernel's VJP
    replays the scan of per-step solve VJPs; memory
    O(iters * batch)).

    **Error-growth contract** (f32, identical for both backends — the
    rounding enters through the per-step products, not an accumulator,
    so compensated/Kahan summation does not apply): relative to the
    exact recurrence, the normwise error after ``k`` iterations is a
    random walk of per-step roundings — measured at 4x4
    (``tests/test_sym_pallas_fused.py::test_chain_error_growth``):
    median ~``sqrt(k) * eps``, p99 ~``k * eps`` (k=128: med 1.3e-6,
    p99 4e-6; a single solve is ~``eps``). Worst lanes can exceed this
    when the recurrence itself cancels (``||x_k||`` decays far below
    the per-step scale) — that amplification is the problem's
    conditioning, not the kernel's. For f64-class tails run under
    ``jax_enable_x64``.
    """
    import jax as _jax

    if iters < 0:
        raise ValueError("iters must be >= 0")
    arrays = (mat, vec) if add is None else (mat, vec, add)
    *arrays, half = upcast_half(*arrays)
    mat, vec = arrays[0], arrays[1]
    add_ = arrays[2] if add is not None else None
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    batch = _nbatch(*arrays)
    # explicit backend="pallas" is validated (raises on unsupported
    # layout/dtype) and honored at ANY iters; the auto gate stays
    # iters > 1 per the documented routing table
    use_kernel = (iters > 1 or backend == "pallas") and _use_pallas(
        backend,
        supported=_pallas_supported(layout, n, mat.dtype,
                                    n_max=_PALLAS_ROLLED_MAX_N),
        batch=batch,
        dtype=mat.dtype,
        small_n=False,
        why_unsupported=(
            f"pallas chain kernel serves compact-symmetric storage with "
            f"N <= {_PALLAS_ROLLED_MAX_N} and real floating dtypes (got "
            f"layout={layout.name}, N={n}, {jnp.dtype(mat.dtype).name})"
        ),
    )
    if iters == 0:
        return _downcast(vec, half)
    if use_kernel:
        from ..kernels.sym_pallas import sym_solve_chain_cf

        if add_ is None:
            out = _cf_call(sym_solve_chain_cf, True, mat, vec,
                           iters=iters, eps=eps)
        else:
            out = _cf_call(
                lambda m, v, a, **kw: sym_solve_chain_cf(m, v, add=a, **kw),
                True, mat, vec, add_, iters=iters, eps=eps)
        return _downcast(out, half)

    step_backend = "auto" if backend == "pallas" else backend

    def body(x, _):
        y = sym_solve(mat, x, eps=eps, backend=step_backend)
        if add_ is not None:
            y = y + add_
        return y, ()

    batch_shape = np.broadcast_shapes(*(a.shape[:-1] for a in arrays))
    out = _jax.lax.scan(body, jnp.broadcast_to(vec, batch_shape + (n,)),
                        None, length=iters)[0]
    return _downcast(out, half)


def sym_matvec_chain(
    mat: jnp.ndarray,
    vec: jnp.ndarray,
    iters: int = 1,
    add: Optional[jnp.ndarray] = None,
    backend: str = "auto",
) -> jnp.ndarray:
    r"""Iterated matvec: ``x_0 = vec``, ``x_{t+1} = A x_t`` (``+ add``
    when given); returns ``x_iters``.

    The matvec analog of :func:`sym_solve_chain` — classical
    Richardson iteration, which with ``add`` given and spectral radius
    of ``A`` below 1 sums the Neumann series for ``(I - A) \ add``.
    Extension op (no reference analog; its closest workload is the
    repeated matvec inside ``maxeig_power``, reference
    ``stochastic.py:356-361``). The recurrence diverges for spectral
    radius > 1 — scaling is the caller's contract, exactly as in
    classical Richardson.

    ``backend="auto"`` routes to the fused Pallas chain kernel on TPU
    (matrix block register-resident across all iterations; pure FMA
    per step — the cheapest chain body); ``"xla"`` runs the
    ``lax.scan`` of :func:`sym_matvec`. Both differentiable.

    **Error-growth contract** (f32, identical for both backends; see
    :func:`sym_solve_chain` for the rationale): normwise error vs the
    exact recurrence is median ~``sqrt(k) * eps``, p99 ~``k * eps``
    (measured at 4x4, k=128: med 1.3e-6, p99 4.3e-6 — the
    ``BENCH_MEASURED.md`` chain row's 3e-5 *max* at k=128 is this
    ``k * eps`` tail on cancellation-amplified lanes). Treating the
    chain as "k exact matvecs" is wrong by exactly this law; use
    ``jax_enable_x64`` for f64-class tails.
    """
    import jax as _jax

    if iters < 0:
        raise ValueError("iters must be >= 0")
    arrays = (mat, vec) if add is None else (mat, vec, add)
    *arrays, half = upcast_half(*arrays)
    mat, vec = arrays[0], arrays[1]
    add_ = arrays[2] if add is not None else None
    n = vec.shape[-1]
    layout = classify_layout(mat.shape[-1], n)
    batch = _nbatch(*arrays)
    # explicit backend="pallas" is validated (raises on unsupported
    # layout/dtype) and honored at ANY iters; the auto gate stays
    # iters > 1 per the documented routing table
    use_kernel = (iters > 1 or backend == "pallas") and _use_pallas(
        backend,
        supported=_pallas_supported(layout, n, mat.dtype,
                                    n_max=_PALLAS_ROLLED_MAX_N),
        batch=batch,
        dtype=mat.dtype,
        small_n=False,
        why_unsupported=(
            f"pallas chain kernel serves compact-symmetric storage with "
            f"N <= {_PALLAS_ROLLED_MAX_N} and real floating dtypes (got "
            f"layout={layout.name}, N={n}, {jnp.dtype(mat.dtype).name})"
        ),
    )
    if iters == 0:
        return _downcast(vec, half)
    if use_kernel:
        from ..kernels.sym_pallas import sym_matvec_chain_cf

        if add_ is None:
            out = _cf_call(sym_matvec_chain_cf, True, mat, vec, iters=iters)
        else:
            out = _cf_call(
                lambda m, v, a, **kw: sym_matvec_chain_cf(m, v, add=a, **kw),
                True, mat, vec, add_, iters=iters)
        return _downcast(out, half)

    step_backend = "auto" if backend == "pallas" else backend

    def body(x, _):
        y = sym_matvec(mat, x, backend=step_backend)
        if add_ is not None:
            y = y + add_
        return y, ()

    batch_shape = np.broadcast_shapes(*(a.shape[:-1] for a in arrays))
    out = _jax.lax.scan(body, jnp.broadcast_to(vec, batch_shape + (n,)),
                        None, length=iters)[0]
    return _downcast(out, half)


def sym_maxeig(
    mat: jnp.ndarray,
    iters: int = 32,
    v0: Optional[jnp.ndarray] = None,
    return_vector: bool = False,
    backend: str = "auto",
    renorm_every: int = 8,
):
    r"""Dominant (largest-``|λ|``) eigenvalue of every matrix in a batch
    by fused power iteration; optionally also the unit eigenvector.

    ``mat`` is compact-symmetric storage ``(..., N(N+1)/2)`` (diag
    first — like :func:`sym_invert`, N is derived from the flat size);
    returns the Rayleigh-quotient estimate ``mu`` of shape
    ``(...)`` — and ``(mu, v)`` with ``v`` of shape ``(..., N)`` when
    ``return_vector``. Batched compact-symmetric specialization of the
    reference's single-matrix ``maxeig_power`` (reference
    ``stochastic.py:316-361``, a while_loop re-launching one matvec per
    step): here ``backend="auto"`` routes to a fused Pallas kernel on
    TPU that runs all ``iters`` matvec+normalize steps with the matrix
    block register-resident (the power-iteration analog of
    :func:`sym_solve_chain`). Convergence is ``O((λ2/λ1)^iters)`` —
    ``iters`` is a static knob (kernels need static trip counts; see
    :func:`fastmath_tpu.ops.stochastic.maxeig_power` for the
    tolerance-driven single-matrix form). Differentiable (VJP replays
    the iteration); at convergence the eigenvalue gradient is the
    classical ``v vᵀ`` pullback.

    ``v0``: optional start vectors ``(..., N)``; the default is a fixed
    dense pseudo-random direction (deterministic). A ``v0`` exactly
    orthogonal to the dominant eigenvector converges to a subdominant
    pair — supply a better ``v0`` (e.g. a previous solution) to warm
    start. ``v0`` also pins ``N`` and thereby the storage layout:
    without it, an ambiguous flat size (3, 6, 10, … are both valid
    diagonal and compact sizes) is read as **compact** — pass ``v0``
    to use diagonal / scaled-identity / full storage (served by the
    XLA path).

    ``renorm_every`` (Pallas path; 1..16, default 8): matvecs per
    normalization. Power iteration is scale-invariant, so per-step
    normalization only guards floating-point range; the kernel instead
    pre-scales each matrix once by its Gershgorin bound and
    renormalizes every ``renorm_every`` steps, turning the steps in
    between into pure FMA chains (the per-step rsqrt + cross-row
    reduction costs ~4x a chain step). Identical in exact arithmetic;
    set ``renorm_every=1`` for textbook per-step normalization.
    """
    import jax as _jax

    if iters < 0:
        raise ValueError("iters must be >= 0")
    if not 1 <= int(renorm_every) <= 16:
        raise ValueError("renorm_every must be in 1..16")
    mat, half = upcast_half(mat)
    nn = mat.shape[-1]
    if v0 is not None:
        # v0 pins N, which disambiguates the storage layout (a flat
        # size like 3 or 6 is both a valid diagonal and a valid
        # compact matrix; without v0 the compact reading wins — the
        # documented contract)
        v0 = jnp.asarray(v0, mat.dtype)
        n = v0.shape[-1]
        layout = classify_layout(nn, n)  # raises if inconsistent
    else:
        n = sym_dim(nn)
        layout = classify_layout(nn, n)
        v0 = _jax.random.normal(_jax.random.key(0), (n,), mat.dtype)
    batch = _nbatch(mat, v0)
    # explicit backend="pallas" is validated and honored at iters = 0
    # too (the kernel serves it: normalize + Rayleigh quotient); the
    # auto gate stays iters >= 1 per the documented routing table
    if (iters > 0 or backend == "pallas") and _use_pallas(
        backend,
        supported=_pallas_supported(layout, n, mat.dtype,
                                    n_max=_PALLAS_ROLLED_MAX_N),
        batch=batch,
        dtype=mat.dtype,
        small_n=False,
        why_unsupported=(
            f"pallas maxeig kernel serves compact-symmetric storage with "
            f"N <= {_PALLAS_ROLLED_MAX_N} and real floating dtypes (got "
            f"layout={layout.name}, N={n}, {jnp.dtype(mat.dtype).name})"
        ),
    ):
        from ..kernels.sym_pallas import sym_maxeig_cf

        out = _cf_call(sym_maxeig_cf, True, mat, v0, iters=iters,
                       renorm_every=renorm_every)
        mu, v = out[..., 0], out[..., 1:]
        mu, v = _downcast(mu, half), _downcast(v, half)
        return (mu, v) if return_vector else mu

    # XLA fallback: layout-general via sym_matvec (diagonal /
    # scaled-identity / full storage — reachable by pinning N with v0 —
    # and every N). Pre-scale by the
    # per-lane max |entry| (layout-general) so a single matvec's norm^2
    # cannot overflow f32 at any input scale (the per-step
    # normalization handles the rest). The scale's own derivative
    # terms cancel identically (the dominant eigenvalue is
    # 1-homogeneous), so stop_gradient(g) yields the exact pullback —
    # and avoids the f32 overflow of the huge intermediate cotangent
    # S(mat)*g that the naive chain rule routes through 1/g.
    def _norm(v):
        nrm2 = jnp.sum(v * v, axis=-1, keepdims=True)
        inv = jnp.where(nrm2 > 0,
                        _jax.lax.rsqrt(jnp.where(nrm2 > 0, nrm2, 1.0)), 0.0)
        return v * inv

    g = _jax.lax.stop_gradient(jnp.max(jnp.abs(mat), axis=-1))
    ms = mat * jnp.where(g > 0, 1.0 / jnp.where(g > 0, g, 1.0),
                         jnp.zeros_like(g))[..., None]
    batch_shape = np.broadcast_shapes(mat.shape[:-1], v0.shape[:-1])
    v = _norm(jnp.broadcast_to(v0, batch_shape + (n,)))

    def body(v, _):
        return _norm(sym_matvec(ms, v, backend="xla")), ()

    v, _ = _jax.lax.scan(body, v, None, length=iters)
    mu = jnp.sum(v * sym_matvec(ms, v, backend="xla"), axis=-1) * g
    mu, v = _downcast(mu, half), _downcast(v, half)
    return (mu, v) if return_vector else mu


def _sym_solve_impl(mat, vec, eps, refine=0):
    n = vec.shape[-1]
    dtype = jnp.result_type(mat, vec)
    mat = mat.astype(dtype)
    vec = vec.astype(dtype)
    layout = classify_layout(mat.shape[-1], n)

    if layout is MatrixLayout.SCALED_IDENTITY:
        d = mat[..., 0]
        if eps is not None:
            d = _apply_eps([d], eps, 1, dtype)[0]
        return vec / d[..., None]
    if layout is MatrixLayout.DIAGONAL:
        d = mat
        if eps is not None:
            parts = _apply_eps([mat[..., i] for i in range(n)], eps, n, dtype)
            d = jnp.stack(parts, axis=-1)
        return vec / d
    if layout is MatrixLayout.FULL:
        full = mat.reshape(*mat.shape[:-1], n, n)
        if eps is not None:
            e = np.asarray(eps, dtype=np.float64).ravel()
            if e.size < n:
                e = np.concatenate([e, np.full(n - e.size, e[-1])])
            full = full + jnp.diag(jnp.asarray(e, dtype=dtype))
        full, v = _broadcast_solve_operands(full, vec)
        return _refined_lmdiv(full, v, refine)

    # compact symmetric
    if n <= _CLOSED_FORM_MAX:
        E = _entries(mat, n)
        if eps is not None:
            diag_parts = _apply_eps([E[i][i] for i in range(n)], eps, n, dtype)
            for i in range(n):
                E[i][i] = diag_parts[i]
        if n == 1:
            return vec / E[0][0][..., None]
        vec_parts = [vec[..., j] for j in range(n)]
        out, det = _adjugate_apply(E, vec_parts, n)
        inv_det = 1.0 / det
        x = [o * inv_det for o in out]
        # iterative refinement x += A^{-1}(v - A x): trace-time unrolled
        # like the Pallas kernel's (kernels/sym_pallas.py _solve_kernel),
        # ~free on a memory-bound fused kernel, sharpens the fp32 tail
        for _ in range(refine):
            r = []
            for i in range(n):
                acc = vec_parts[i] - E[i][i] * x[i]
                for j in range(n):
                    if j != i:
                        acc = acc - E[i][j] * x[j]
                r.append(acc)
            dx, _ = _adjugate_apply(E, r, n)
            x = [xi + d * inv_det for xi, d in zip(x, dx)]
        return jnp.stack(x, axis=-1)

    full = sym_to_full(mat, n)
    if eps is not None:
        e = np.asarray(eps, dtype=np.float64).ravel()
        if e.size < n:
            e = np.concatenate([e, np.full(n - e.size, e[-1])])
        full = full + jnp.diag(jnp.asarray(e, dtype=dtype))
    full, v = _broadcast_solve_operands(full, vec)
    return _refined_lmdiv(full, v, refine)


def _refined_lmdiv(full, v, refine):
    """Batched full-matrix solve with optional iterative refinement
    (the densified tail of :func:`sym_solve`; XLA CSEs the repeated
    factorization subgraphs)."""
    from .batched import batchlmdiv, batchmatvec

    x = batchlmdiv(full, v)
    for _ in range(refine):
        r = v - batchmatvec(full, x)
        x = x + batchlmdiv(full, r)
    return x


def _broadcast_solve_operands(full, vec):
    """Broadcast batch dims of a full matrix (..., n, n) and vector (..., n)."""
    batch = np.broadcast_shapes(full.shape[:-2], vec.shape[:-1])
    n = vec.shape[-1]
    full = jnp.broadcast_to(full, batch + full.shape[-2:])
    vec = jnp.broadcast_to(vec, batch + (n,))
    return full, vec


def sym_det(mat: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Determinant of a compact symmetric matrix ``(..., N(N+1)/2) -> (...)``.

    Closed form (trace-time Laplace expansion) for N <= 4, unrolled
    pivoted LU for N <= 8 (via the full-storage tier), densify +
    ``jnp.linalg.det`` beyond. ``backend`` routes exactly like
    :func:`sym_solve` (the Pallas tier wins on the register-resident
    PLU at 5 <= N <= 8). Reference analog: ``_impl/sym.py:401-452``.
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    mat, half = upcast_half(mat)
    n = sym_dim(mat.shape[-1])
    layout = MatrixLayout.COMPACT_SYM
    if _route_compact(backend, layout, n, mat.dtype, _nbatch(mat),
                      n_max=_PALLAS_ROLLED_MAX_N):
        from ..kernels.sym_pallas import sym_det_cf

        return _downcast(_cf_call(sym_det_cf, False, mat), half)
    if n <= _CLOSED_FORM_MAX:
        return _downcast(_det_full(_entries(mat, n), n), half)
    from .batched import batchdet

    return _downcast(batchdet(sym_to_full(mat, n)), half)


def sym_invert(
    mat: jnp.ndarray, diag: bool = False, backend: str = "auto"
) -> jnp.ndarray:
    """Inverse of a compact symmetric matrix, in compact storage.

    ``diag=True`` returns only the diagonal of the inverse (shape
    ``(..., N)``). ``backend`` routes exactly like :func:`sym_solve`.
    Reference analog: ``_impl/sym.py:455-493`` (there: N solves against
    identity columns; here: direct cofactor/adjugate for N <= 4,
    in-register pivoted LU for N <= 8, one batched full inverse beyond).
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    mat, half = upcast_half(mat)
    n = sym_dim(mat.shape[-1])
    if _route_compact(backend, MatrixLayout.COMPACT_SYM, n, mat.dtype,
                      _nbatch(mat), n_max=_PALLAS_ROLLED_MAX_N):
        from ..kernels.sym_pallas import sym_invert_cf

        out = jnp.moveaxis(sym_invert_cf(jnp.moveaxis(mat, -1, 0), bm=True),
                           0, -1)
        if diag:
            out = out[..., :n]
        return _downcast(out, half)
    return _downcast(_sym_invert_impl(mat, diag), half)


def _sym_invert_impl(mat, diag):
    n = sym_dim(mat.shape[-1])
    if n <= _CLOSED_FORM_MAX:
        E = _entries(mat, n)
        cache = {}
        idx = tuple(range(n))
        det = _det_expand(E, idx, idx, cache)
        inv_det = 1.0 / det
        diag_entries = []
        upper_entries = []
        for i in range(n):
            for j in range(i, n):
                rows = tuple(r for r in idx if r != j)
                cols = tuple(c for c in idx if c != i)
                minor = _det_expand(E, rows, cols, cache)
                cof = -minor if (i + j) % 2 else minor
                (diag_entries if i == j else upper_entries).append(cof * inv_det)
        if diag:
            return jnp.stack(diag_entries, axis=-1)
        return jnp.stack(diag_entries + upper_entries, axis=-1)
    from .batched import batchinv

    full = batchinv(sym_to_full(mat, n))  # PLU tiers for n <= 32
    if diag:
        return jnp.diagonal(full, axis1=-2, axis2=-1)
    return full_to_sym(full)


# ---------------------------------------------------------------------------
# outer products / congruence
# ---------------------------------------------------------------------------


def sym_outer(x: jnp.ndarray, backend: str = "auto") -> jnp.ndarray:
    """Symmetric outer product ``x @ x.T`` in compact storage
    ``(..., N) -> (..., N(N+1)/2)``. Purely elementwise, so ``auto`` ==
    ``xla`` (see :func:`sym_matvec`); ``"pallas"`` forces the kernel.
    Reference: ``_impl/sym.py:496-528``."""
    x, half = upcast_half(x)
    n = x.shape[-1]
    if _route_compact(backend, MatrixLayout.COMPACT_SYM, n, x.dtype, _nbatch(x),
                      auto=False):
        from ..kernels.sym_pallas import sym_outer_cf

        return _downcast(_cf_call(sym_outer_cf, True, x), half)
    parts = [x[..., i] * x[..., i] for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            parts.append(x[..., i] * x[..., j])
    return _downcast(jnp.stack(parts, axis=-1), half)


_JHJ_UNROLL_MAX = 6
# the Pallas congruence kernel's rolled stacked-grid tier
# (kernels/sym_pallas.py _JHJ_MAX_ROLLED)
_JHJ_MAX_ROLLED = 32


def sym_matmul(
    j: jnp.ndarray, h: jnp.ndarray, backend: str = "auto"
) -> jnp.ndarray:
    """Congruence product ``J.T @ H @ J`` with compact-symmetric ``H``.

    ``j``: ``(..., K, D)`` full matrix; ``h``: ``(..., K(K+1)/2)``
    compact; returns ``(..., D(D+1)/2)`` compact. For K, D <= 6 the
    double contraction unrolls at trace time straight on the compact
    slots (a per-item KxD einsum occupies a 128x128 MXU tile almost
    entirely with padding — same pathology as ``batchmatmul``); for
    7 <= max(K, D) <= 32 ``backend="auto"`` routes to the rolled
    stacked-grid Pallas kernel on TPU (two passes of K rank-1
    broadcast FMAs, VPU lane-parallel — no MXU tile padding);
    densify + einsum beyond.
    Reference analog: ``_impl/sym.py:637-670`` (jhj kernels).
    The routed Pallas path carries a custom VJP (reverse-mode
    only); forward-mode AD (``jax.jvp`` / ``jacfwd``) needs
    ``backend="xla"``.
    """
    j, h, half = upcast_half(j, h)
    k = j.shape[-2]
    if h.shape[-1] != compact_size(k):
        raise ValueError(
            f"h last axis {h.shape[-1]} does not match compact size "
            f"{compact_size(k)} for K={k}"
        )
    d = j.shape[-1]
    # K, D <= 6: the trace-time unrolled XLA form fuses and is
    # compute-dense, so auto == xla; beyond 6 the XLA path is a
    # densify + einsum whose tiny per-item matmuls pad the MXU tile —
    # the rolled stacked-grid kernel (7 <= max(K, D) <= 32) wins
    # there, so auto routes it on TPU. backend="pallas" forces either.
    if _route_compact(backend, MatrixLayout.COMPACT_SYM, max(k, d),
                      jnp.result_type(j, h),
                      _nbatch(j.reshape(*j.shape[:-2], k * d), h),
                      n_max=_JHJ_MAX_ROLLED,
                      auto=max(k, d) > _JHJ_UNROLL_MAX):
        from ..kernels.sym_pallas import sym_matmul_cf

        j2 = jnp.moveaxis(j.reshape(*j.shape[:-2], k * d), -1, 0)
        h2 = jnp.moveaxis(h, -1, 0)
        return _downcast(
            jnp.moveaxis(sym_matmul_cf(j2, h2, bm=True), 0, -1), half
        )
    if max(k, d) <= _JHJ_UNROLL_MAX:
        # out[(i,jj)] = sum_{a,b} J[a,i] H[a,b] J[b,jj], H from compact
        H = _entries(h, k)
        J = [[j[..., a, i] for i in range(d)] for a in range(k)]
        # precompute (H J)[a][jj] = sum_b H[a][b] J[b][jj]
        HJ = [[None] * d for _ in range(k)]
        for a in range(k):
            for jj in range(d):
                acc = H[a][0] * J[0][jj]
                for b in range(1, k):
                    acc = acc + H[a][b] * J[b][jj]
                HJ[a][jj] = acc
        parts = []
        for i in range(d):
            acc = J[0][i] * HJ[0][i]
            for a in range(1, k):
                acc = acc + J[a][i] * HJ[a][i]
            parts.append(acc)
        for i in range(d):
            for jj in range(i + 1, d):
                acc = J[0][i] * HJ[0][jj]
                for a in range(1, k):
                    acc = acc + J[a][i] * HJ[a][jj]
                parts.append(acc)
        return _downcast(jnp.stack(parts, axis=-1), half)
    h_full = sym_to_full(h, k)
    out_full = jnp.einsum("...ki,...kl,...lj->...ij", j, h_full, j, precision="highest")
    return _downcast(full_to_sym(out_full), half)


# functional aliases for the reference's in-place variants
sym_solve_ = sym_solve
sym_invert_ = sym_invert


def sym_addmatvec_(acc, mat, vec):
    """Alias of :func:`sym_addmatvec` (functional; donation replaces
    in-place)."""
    return sym_addmatvec(acc, mat, vec)


def sym_submatvec_(acc, mat, vec):
    """Alias of :func:`sym_submatvec` (functional)."""
    return sym_submatvec(acc, mat, vec)
