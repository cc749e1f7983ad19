"""Public capability modules (flat re-export happens in the package root)."""
from . import sym  # noqa: F401
