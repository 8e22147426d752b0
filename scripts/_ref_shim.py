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

# Newer JAX rejects jnp.clip on complex values; the reference clips its
# complex local energy (src/VMC.py:64,73).  Old JAX lowered clip through
# minimum/maximum, which order complex numbers lexicographically
# (real part first, then imaginary) — reproduce that here so the reference
# runs with its original numerics.
import jax.numpy as jnp

_orig_clip = jnp.clip


def _lex_less(a, b):
    return (a.real < b.real) | ((a.real == b.real) & (a.imag < b.imag))


def _compat_clip(x, min=None, max=None, **kw):
    vals = [v for v in (x, min, max) if v is not None]
    if not any(jnp.iscomplexobj(v) for v in vals):
        return _orig_clip(x, min=min, max=max, **kw)
    x = jnp.asarray(x)
    if min is not None:
        lo = jnp.asarray(min).astype(x.dtype)
        x = jnp.where(_lex_less(x, lo), lo, x)
    if max is not None:
        hi = jnp.asarray(max).astype(x.dtype)
        x = jnp.where(_lex_less(hi, x), hi, x)
    return x


jnp.clip = _compat_clip

sys.path.insert(0, "/root/reference")
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path("/root/reference/main.py", run_name="__main__")
