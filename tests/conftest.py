"""Test harness config: CPU backend with 8 virtual devices, float64.

The axon TPU plugin ignores JAX_PLATFORMS, so the backend is forced through
the config flag before any JAX usage.
"""
import os
import sys

# APPEND (not setdefault): if the environment already sets XLA_FLAGS the
# 8-device virtual mesh must still materialize, otherwise every sharding/halo
# test silently skips and a green suite stops meaning "multi-device ran".
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"


def ref_deck(name: str) -> str:
    for ver in ("HAKAI-v0.0.0", "HAKAI-v0.0.1", "HAKAI-v0.0.2"):
        p = os.path.join(REF, ver, "input", name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(name)
