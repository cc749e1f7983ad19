#!/usr/bin/env python
"""Build the optional native CPU extension (g++ required).

Equivalent to the lazy first-import build in ``fastmath_tpu.native``;
run explicitly for deployment images:

    python setup_native.py
"""
import sys

from fastmath_tpu import native

if __name__ == "__main__":
    ok = native.build(force="--force" in sys.argv)
    if ok and native.available():
        print(f"native library ready ({native.get_num_threads()} threads)")
        sys.exit(0)
    print("native build failed (g++ missing?)", file=sys.stderr)
    sys.exit(1)
