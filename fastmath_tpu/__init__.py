"""fastmath-tpu: TPU-native fast math for huge batches of tiny problems.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nitorch-fastmath`` (reference layout at ``nitorch_fastmath/__init__.py``):
compact-symmetric matrix ops, batched small-matrix linear algebra,
NaN-omitting reductions, simplex utilities, special functions, Lie-group
matrix exp/log, batched symmetric eigendecomposition, DCT/DST, and
stochastic trace/log-det estimators — with Pallas TPU kernels on the hot
paths and ``shard_map`` batch sharding for multi-chip scale.

Like the reference (``__init__.py:1-10``), the public API is one flat
namespace re-exporting every capability module; the modules are also
importable individually (``fastmath_tpu.ops.reduce`` etc. — use the
module paths to avoid the builtin-shadowing names ``sum``/``min``/
``max``/``round`` in the flat namespace, which exist for reference
parity).
"""

__version__ = "0.1.0"

from . import core, layouts, typing, utils
from .core.cache import enable_compilation_cache  # noqa: F401

# honor FASTMATH_TPU_CACHE_DIR at import time (persistent compilation
# cache for the minutes-cold rolled-tier Mosaic kernels — core/cache.py)
from .core.cache import _maybe_enable_from_env as _cache_env_hook

_cache_env_hook()
del _cache_env_hook
from . import parallel
from .ops import batched, lie, qr, realtransforms, reduce, simplex, special
from .ops import stochastic, sugar, sym
from . import kernels

# flat re-export, mirroring the reference's star-import style
from .ops.sym import *  # noqa: F401,F403
from .ops.batched import *  # noqa: F401,F403
from .ops.lie import *  # noqa: F401,F403
from .ops.qr import *  # noqa: F401,F403
from .ops.realtransforms import *  # noqa: F401,F403
from .ops.reduce import *  # noqa: F401,F403
from .ops.simplex import *  # noqa: F401,F403
from .ops.special import *  # noqa: F401,F403
from .ops.stochastic import *  # noqa: F401,F403
from .ops.sugar import *  # noqa: F401,F403
from .kernels import sym_solve_cf, sym_matvec_cf, sym_invert_cf  # noqa: F401

__all__ = [
    "core",
    "layouts",
    "typing",
    "utils",
    "parallel",
    "kernels",
    "batched",
    "lie",
    "qr",
    "realtransforms",
    "reduce",
    "simplex",
    "special",
    "stochastic",
    "sugar",
    "sym",
    "enable_compilation_cache",
    "__version__",
]
