"""End-to-end numerical check of the production TPU path (thin CLI over
super_resolution_tpu/utils/kernel_parity.py — bench.py embeds the same
check in the driver-visible JSON).

Usage: python scripts/tpu_parity_check.py [--arch fork|classic]
           [--hw 128] [--scale 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="fork", choices=["fork", "classic"])
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--scale", type=int, default=4)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from super_resolution_tpu.utils.kernel_parity import kernel_parity

    out = kernel_parity(args.arch, args.hw, args.scale)
    print(json.dumps({"arch": args.arch, "hw": args.hw, **out}))


if __name__ == "__main__":
    main()
