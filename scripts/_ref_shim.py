"""Run the REFERENCE /root/reference/main.py unmodified on modern JAX (CPU).

The reference imports ``from jax.config import config`` (removed in newer
JAX) and relies on the JAX_PLATFORMS env var (overridden by the axon
harness), so this shim pre-seeds a compatible ``jax.config`` module and
forces the CPU backend before handing sys.argv to the reference script via
runpy.  Used only by scripts/yardstick.py for the cross-implementation
wall-clock comparison; no reference code is copied or altered.
"""

import runpy
import sys
import types

import jax

jax.config.update("jax_platforms", "cpu")

shim = types.ModuleType("jax.config")
shim.config = jax.config
sys.modules["jax.config"] = shim

# removed-in-0.5 aliases the reference still calls
jax.tree_map = jax.tree.map

sys.path.insert(0, "/root/reference")
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path("/root/reference/main.py", run_name="__main__")
