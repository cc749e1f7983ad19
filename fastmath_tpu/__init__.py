"""fastmath-tpu: TPU-native fast math for huge batches of tiny problems.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``nitorch-fastmath`` (reference layout at ``nitorch_fastmath/__init__.py``):
compact-symmetric matrix ops, batched small-matrix linear algebra,
NaN-omitting reductions, simplex utilities, special functions, Lie-group
matrix exp/log, batched symmetric eigendecomposition, DCT/DST, and
stochastic trace/log-det estimators — with Pallas TPU kernels on the hot
paths and ``shard_map`` batch sharding for multi-chip scale.

Like the reference, the public API is one flat namespace re-exporting
every capability module.
"""

__version__ = "0.1.0"

from . import core, layouts

__all__ = ["core", "layouts", "__version__"]
