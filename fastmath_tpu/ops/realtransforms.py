"""DCT / DST types I-IV with backward / ortho / forward / ortho_scipy
norms, 1-D and N-D, plus inverses.

Capability parity with the reference's ``realtransforms`` stack
(``nitorch_fastmath/realtransforms.py`` + ``_impl/realtransforms*.py``,
itself adapted from cuPy's scipy port), plus one documented extension:
**type 4 is implemented** (the reference raises,
``_impl/realtransforms.py:8``) — DCT-IV/DST-IV follow the scipy
definitions, are self-dual under ``fliptype`` (4 -> 4), and their
``ortho`` form is involutive. Norms: ``backward``/``ortho``/``forward``
plus the ``ortho_scipy`` compat mode — legacy scipy/cupy "ortho"
DST-II/III, which is *not* truly orthogonal (reference warning at
``_impl/realtransforms.py:95-99``; type 4's ortho is truly orthogonal
in scipy, so the two modes coincide there). Inverses are flipped-type +
flipped-norm transforms (reference ``realtransforms_autograd.py:5-11``).

TPU-first design, a deliberate departure from the reference's
FFT-only pipeline:

* **Matmul path** (default for axis length <= 1024): the transform is a
  precomputed orthosized basis matrix applied with one einsum — this
  rides the **MXU**, which for the huge-batch / small-to-moderate-n
  regime this library targets beats the FFT pipeline's reshuffle +
  twiddle + FFT chain (reference ``realtransforms_from_fft.py:766-1020``)
  both in time and in fusion friendliness. Basis matrices are built once
  per (family, type, n, norm, dtype) at trace time in float64 and cast.
* **FFT path** (longer axes): real-FFT of symmetric/antisymmetric
  extensions — O(n log n), no complex twiddle bookkeeping: DCT-II via
  ``rfft`` of ``[x, reverse(x)]``; DCT-III as the exact FFT inverse of
  that pipeline; DCT-I via ``rfft`` of the mirrored extension; DST-I via
  ``rfft`` of the odd extension; DST-II/III by the sign/reversal duality
  with DCT-II/III.
* Both paths are **linear**, so JAX's transpose rules give exact,
  residual-free gradients automatically (the reference needed
  hand-written autograd Functions with boundary rescaling,
  ``realtransforms_autograd.py:14-85``).

dtype promotion matches scipy/the reference (int -> f64, f16/bf16 ->
f32; ``_impl/realtransforms_from_fft.py:720-730``): complex inputs
transform real and imaginary parts independently.
"""
from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.dtypes import promote_transform_dtype
from ..core.shapes import ensure_tuple

__all__ = [
    "dct",
    "idct",
    "dst",
    "idst",
    "dctn",
    "idctn",
    "dstn",
    "idstn",
]

_IMPLEMENTED_TYPES = (1, 2, 3, 4)

flipnorm = {
    "forward": "backward",
    "backward": "forward",
    "ortho": "ortho",
    "ortho_scipy": "ortho_scipy",
}
fliptype = {1: 1, 2: 3, 3: 2, 4: 4}

# axis lengths up to this use the MXU matmul path; beyond, the FFT path
# Measured on v5e (BENCH_MEASURED / exp): the MXU basis-matmul path
# beats the FFT path at every n through 4096 (2.2x at 2048, 1.4x at
# 4096, f32 'highest'); the basis matrix is n^2 x 4 B (67 MB at 4096),
# so the FFT path takes over beyond this gate.
MATMUL_MAX_N = 4096


# ---------------------------------------------------------------------------
# normalization tables: y = diag(dout) @ T_backward( diag(din) @ x )
# ---------------------------------------------------------------------------


def _norm_scales(family: str, type: int, n: int, norm: str):
    """Pre/post diagonal scalings relative to the 'backward' transform.

    Returns (din, dout) as float64 numpy arrays of shape (n,) (or
    scalars). Conventions established against scipy.fft (see tests):
    'ortho' is the truly orthogonal variant for all six transforms;
    'ortho_scipy' differs only for DST-II/III (uniform scaling, the
    legacy scipy/cupy behavior the reference replicates).
    """
    norm = norm or "backward"
    delta = -1 if type == 1 else 0
    full = 2 * (n + delta) if family == "dct" else 2 * (n - delta)
    # (dct1: 2(n-1); dst1: 2(n+1); types 2/3: 2n)
    if norm == "backward":
        return 1.0, 1.0
    if norm == "forward":
        return 1.0, 1.0 / full
    if norm not in ("ortho", "ortho_scipy"):
        raise ValueError(f"Unknown norm {norm!r}")
    s = 1.0 / math.sqrt(full)
    scipy_legacy = norm == "ortho_scipy"
    din = np.ones(n)
    dout = np.full(n, s)
    if family == "dct":
        # scipy's dct ortho was always truly orthogonal; ortho_scipy == ortho
        if type == 1:
            din[0] = din[-1] = math.sqrt(2)
            dout[0] *= 1 / math.sqrt(2)
            dout[-1] *= 1 / math.sqrt(2)
        elif type == 2:
            dout[0] *= 1 / math.sqrt(2)
        elif type == 3:
            din[0] = math.sqrt(2)
        # type 4: uniform scaling only (truly orthogonal as-is)
    else:
        # dst1 is naturally orthogonal under uniform scaling; dst2/3 need
        # the endpoint fix that legacy scipy omits
        # type 4: uniform scaling only (orthogonal in scipy too, so
        # ortho_scipy == ortho)
        if not scipy_legacy:
            if type == 2:
                dout[-1] *= 1 / math.sqrt(2)
            elif type == 3:
                din[-1] = math.sqrt(2)
    return din, dout


# ---------------------------------------------------------------------------
# backward-norm transforms: matmul path
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _basis_matrix(family: str, type: int, n: int, norm: str) -> np.ndarray:
    """(n, n) float64 matrix M with y = M @ x for the normalized
    transform along a length-n axis (built from the scipy definitions)."""
    j = np.arange(n)[None, :]
    k = np.arange(n)[:, None]
    if family == "dct":
        if type == 1:
            if n < 2:
                raise ValueError("DCT-I requires n >= 2")
            m = 2.0 * np.cos(np.pi * j * k / (n - 1))
            m[:, 0] = 1.0
            m[:, -1] = np.cos(np.pi * k[:, 0])  # (-1)^k
        elif type == 2:
            m = 2.0 * np.cos(np.pi * k * (2 * j + 1) / (2 * n))
        elif type == 3:
            m = 2.0 * np.cos(np.pi * j * (2 * k + 1) / (2 * n))
            m[:, 0] = 1.0
        else:  # type 4 (extension; scipy definition)
            m = 2.0 * np.cos(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))
    else:
        if type == 1:
            m = 2.0 * np.sin(np.pi * (j + 1) * (k + 1) / (n + 1))
        elif type == 2:
            m = 2.0 * np.sin(np.pi * (k + 1) * (2 * j + 1) / (2 * n))
        elif type == 3:
            m = 2.0 * np.sin(np.pi * (j + 1) * (2 * k + 1) / (2 * n))
            m[:, -1] = np.cos(np.pi * k[:, 0])  # (-1)^k
        else:  # type 4 (extension; scipy definition)
            m = 2.0 * np.sin(np.pi * (2 * j + 1) * (2 * k + 1) / (4 * n))
    din, dout = _norm_scales(family, type, n, norm)
    m = np.asarray(dout).reshape(-1, 1) * m * np.asarray(din).reshape(1, -1)
    return m


# ---------------------------------------------------------------------------
# backward-norm transforms: FFT path (real FFTs of symmetric extensions)
# ---------------------------------------------------------------------------


def _dct2_back_fft(x):
    """DCT-II, backward norm, along the last axis via rfft of [x, rev x]."""
    n = x.shape[-1]
    z = jnp.concatenate([x, x[..., ::-1]], axis=-1)
    zf = jnp.fft.rfft(z, axis=-1)[..., :n]
    k = jnp.arange(n)
    tw = jnp.exp(-1j * jnp.pi * k / (2 * n))
    return (zf * tw).real.astype(x.dtype)


def _dct3_back_fft(x):
    """DCT-III, backward norm = 2n * (DCT-II backward)^{-1}: invert the
    rfft pipeline of :func:`_dct2_back_fft` exactly."""
    n = x.shape[-1]
    k = jnp.arange(n)
    tw = jnp.exp(1j * jnp.pi * k / (2 * n))
    zf = x.astype(_complex_dtype(x.dtype)) * tw
    zero = jnp.zeros_like(zf[..., :1])
    zf = jnp.concatenate([zf, zero], axis=-1)  # Z_n = 0
    z = jnp.fft.irfft(zf, n=2 * n, axis=-1)
    return (2 * n) * z[..., :n].astype(x.dtype)


def _dct1_back_fft(x):
    """DCT-I, backward norm: rfft of the mirrored extension
    [x_0..x_{n-1}, x_{n-2}..x_1] (length 2(n-1))."""
    n = x.shape[-1]
    z = jnp.concatenate([x, x[..., -2:0:-1]], axis=-1)
    zf = jnp.fft.rfft(z, axis=-1)
    return zf.real.astype(x.dtype)


def _dst1_back_fft(x):
    """DST-I, backward norm: rfft of the odd extension
    [0, x, 0, -rev(x)] (length 2(n+1))."""
    n = x.shape[-1]
    zero = jnp.zeros_like(x[..., :1])
    z = jnp.concatenate([zero, x, zero, -x[..., ::-1]], axis=-1)
    zf = jnp.fft.rfft(z, axis=-1)
    return (-zf.imag[..., 1 : n + 1]).astype(x.dtype)


def _alt_signs(x):
    n = x.shape[-1]
    sign = jnp.asarray((-1.0) ** np.arange(n), dtype=x.dtype)
    return x * sign


def _dst2_back_fft(x):
    # DST-II(x)_k = DCT-II((-1)^j x_j)_{n-1-k}
    return _dct2_back_fft(_alt_signs(x))[..., ::-1]


def _dst3_back_fft(x):
    # transpose duality: DST-III = S o DCT-III o R
    return _alt_signs(_dct3_back_fft(x[..., ::-1]))


def _dct4_back_fft(x):
    """DCT-IV, backward norm (extension): odd bins of the length-4n FFT
    of the zero-padded input — X_k = 2 Re[e^{-i pi (2k+1)/(4n)} F_{2k+1}]."""
    n = x.shape[-1]
    z = jnp.zeros((*x.shape[:-1], 4 * n), dtype=_complex_dtype(x.dtype))
    z = z.at[..., :n].set(x.astype(z.dtype))
    f = jnp.fft.fft(z, axis=-1)[..., 1 : 2 * n : 2]
    k = jnp.arange(n)
    tw = jnp.exp(-1j * jnp.pi * (2 * k + 1) / (4 * n))
    return 2.0 * (f * tw).real.astype(x.dtype)


def _dst4_back_fft(x):
    """DST-IV, backward norm (extension): same odd-bin pipeline with
    -Im instead of Re."""
    n = x.shape[-1]
    z = jnp.zeros((*x.shape[:-1], 4 * n), dtype=_complex_dtype(x.dtype))
    z = z.at[..., :n].set(x.astype(z.dtype))
    f = jnp.fft.fft(z, axis=-1)[..., 1 : 2 * n : 2]
    k = jnp.arange(n)
    tw = jnp.exp(-1j * jnp.pi * (2 * k + 1) / (4 * n))
    return -2.0 * (f * tw).imag.astype(x.dtype)


def _complex_dtype(real_dtype):
    return jnp.complex64 if jnp.dtype(real_dtype) == jnp.float32 else jnp.complex128


_FFT_BACK = {
    ("dct", 1): _dct1_back_fft,
    ("dct", 2): _dct2_back_fft,
    ("dct", 3): _dct3_back_fft,
    ("dct", 4): _dct4_back_fft,
    ("dst", 1): _dst1_back_fft,
    ("dst", 2): _dst2_back_fft,
    ("dst", 3): _dst3_back_fft,
    ("dst", 4): _dst4_back_fft,
}


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _transform_last(x, family: str, type: int, norm: str,
                    precision=None):
    """Apply the normalized transform along the last axis."""
    n = x.shape[-1]
    if n <= MATMUL_MAX_N:
        m = jnp.asarray(_basis_matrix(family, type, n, norm), dtype=x.dtype)
        # MXU pass precision (measured v5e, n=2048, vs f64 oracle):
        # "highest" (f32 passes, the default) runs at that mode's
        # matmul roofline (~30 TF/s) with normwise err ~2e-7;
        # "high" (bf16x3) is 1.9x faster at ~1e-5; "default" (bf16
        # inputs) 4.4x faster at ~2e-3 — the fp32 contract keeps
        # "highest" unless the caller opts down
        return jnp.einsum("kj,...j->...k", m, x,
                          precision=precision or "highest")
    din, dout = _norm_scales(family, type, n, norm)
    if not np.isscalar(din) or din != 1.0:
        x = x * jnp.asarray(np.broadcast_to(din, (n,)), dtype=x.dtype)
    y = _FFT_BACK[(family, type)](x)
    if not np.isscalar(dout) or dout != 1.0:
        y = y * jnp.asarray(np.broadcast_to(dout, (n,)), dtype=y.dtype)
    return y


def _transform(x, family: str, type: int, dim: int, norm: str,
               precision=None):
    if type not in _IMPLEMENTED_TYPES:
        raise ValueError(f"{family.upper()} only implemented for types I-IV")
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        re = _transform(x.real, family, type, dim, norm, precision)
        im = _transform(x.imag, family, type, dim, norm, precision)
        return re + 1j * im
    x = x.astype(promote_transform_dtype(x.dtype))
    dim = dim % x.ndim
    if dim != x.ndim - 1:
        x = jnp.moveaxis(x, dim, -1)
    y = _transform_last(x, family, type, norm, precision)
    if dim != y.ndim - 1:
        y = jnp.moveaxis(y, -1, dim)
    return y


# ---------------------------------------------------------------------------
# public API (signatures mirror the reference)
# ---------------------------------------------------------------------------


def dct(x, dim: int = -1, norm: str = "backward", type: int = 2,
        precision=None):
    """Discrete Cosine Transform, types I-IV (reference
    ``_impl/realtransforms.py:11-45``; type 4 is an extension — the
    reference raises on it).

    ``precision`` (extension): MXU precision for the basis-matmul path
    (``None``/"highest" = full fp32, "high" = bf16x3 ~1.9x faster at
    ~1e-5 normwise error, "default" = bf16 ~4.4x at ~2e-3); the FFT
    path (n > 4096) ignores it."""
    if dim is None:
        dim = -1
    return _transform(x, "dct", type, dim, norm or "backward", precision)


def idct(x, dim: int = -1, norm: str = "backward", type: int = 2,
         precision=None):
    """Inverse DCT = flipped-type, flipped-norm DCT (reference
    ``_impl/realtransforms.py:48-81``)."""
    if dim is None:
        dim = -1
    return dct(x, dim, flipnorm[norm or "backward"], fliptype[type],
               precision)


def dst(x, dim: int = -1, norm: str = "backward", type: int = 2,
        precision=None):
    """Discrete Sine Transform, types I-IV (type 4 is an extension —
    the reference raises on it). ``norm='ortho'`` is truly orthogonal;
    use ``norm='ortho_scipy'`` for legacy scipy/cupy behavior
    (reference ``_impl/realtransforms.py:84-126``). ``precision`` as in
    :func:`dct`."""
    if dim is None:
        dim = -1
    return _transform(x, "dst", type, dim, norm or "backward", precision)


def idst(x, dim: int = -1, norm: str = "backward", type: int = 2,
         precision=None):
    """Inverse DST = flipped-type, flipped-norm DST (reference
    ``_impl/realtransforms.py:127-167``)."""
    if dim is None:
        dim = -1
    return dst(x, dim, flipnorm[norm or "backward"], fliptype[type],
               precision)


def _norm_dims(x, dim):
    if dim is None:
        return tuple(range(jnp.asarray(x).ndim))
    return tuple(d % jnp.asarray(x).ndim for d in ensure_tuple(dim))


def dctn(x, dim=None, norm: str = "backward", type: int = 2,
         precision=None):
    """N-D DCT: 1-D transforms applied over each requested dim
    (reference ``_impl/realtransforms.py:169-206``)."""
    for d in _norm_dims(x, dim):
        x = dct(x, d, norm, type, precision)
    return x


def idctn(x, dim=None, norm: str = "backward", type: int = 2,
         precision=None):
    """N-D inverse DCT (reference ``_impl/realtransforms.py:207-243``)."""
    for d in _norm_dims(x, dim):
        x = idct(x, d, norm, type, precision)
    return x


def dstn(x, dim=None, norm: str = "backward", type: int = 2,
         precision=None):
    """N-D DST (reference ``_impl/realtransforms.py:244-287``)."""
    for d in _norm_dims(x, dim):
        x = dst(x, d, norm, type, precision)
    return x


def idstn(x, dim=None, norm: str = "backward", type: int = 2,
         precision=None):
    """N-D inverse DST (reference ``_impl/realtransforms.py:288-328``)."""
    for d in _norm_dims(x, dim):
        x = idst(x, d, norm, type, precision)
    return x
