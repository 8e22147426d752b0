"""Global precision / platform policy for the TPU-native CoulombGas stack.

The reference (fermiflow/CoulombGas) runs everything in float64/complex128
(reference: main.py:2-3).  TPUs have no native f64 ALU path: elementwise f64
is emulated (slow), LU decomposition supports only f32/c64, and complex128 is
unsupported outright.  We therefore centralize the dtype policy here:

  * on CPU (tests, oracles):   float64 / complex128 by default,
  * on TPU (production):       float32 / complex64,

and every module asks this config for its dtypes instead of hard-coding them.
Physics-parity is validated against the arbitrary-precision mpmath oracle in
``coulombgas_tpu.analytic`` (reference: src/freefermion/analytic.py).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

# Sharding-friendly counter-based RNG: random arrays generated under jit can
# be partitioned over the device mesh without materializing on one device.
jax.config.update("jax_threefry_partitionable", True)

# True-f32 matmuls: TPUs compute f32 dots in bf16 passes by default, which
# costs ~3 decimal digits in the Slater/Jacobian Gram matrices and the flow
# layers — measurable logp error (~0.1) against the f64 oracle.  All models
# here are tiny and bandwidth-bound, so the extra MXU passes are cheap.
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE on x64: globally enabling it flips the DEFAULT dtypes (f64/i64) of
# every jnp.ones/arange across the stack, which drags emulated-f64 and i64
# ops into the TPU graphs (the n=49 pretrain update then crashes the TPU
# compiler outright).  So x64 stays platform-policy-driven (enable_x64() on
# CPU only), and the SR solve recovers f64-like accuracy in pure f32 via
# Jacobi scaling + iterative refinement instead (optim/sr.py).

# Persistent compilation cache: the AD graphs here are large and the TPU
# compile path is slow, so executables are cached on disk across processes.
_CACHE_DIR = os.environ.get(
    "COULOMBGAS_COMPILE_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax without the flag
    pass


@dataclass(frozen=True)
class Precision:
    """Dtype bundle used across the framework."""

    real: jnp.dtype
    complex: jnp.dtype

    @property
    def is_x64(self) -> bool:
        return jnp.dtype(self.real) == jnp.float64


F32 = Precision(real=jnp.dtype("float32"), complex=jnp.dtype("complex64"))
# F64 requires jax_enable_x64; complex128 is CPU-only.
F64 = Precision(real=jnp.dtype("float64"), complex=jnp.dtype("complex128"))


def default_precision() -> Precision:
    """Pick the precision for the current default backend.

    CPU -> f64 (matches the reference numerics bit-for-bit in spirit),
    TPU -> f32 (native speed; validated against the f64/mpmath oracles).
    Overridable with COULOMBGAS_PRECISION={f32,f64}.
    """
    env = os.environ.get("COULOMBGAS_PRECISION", "").lower()
    if env in ("f32", "float32"):
        return F32
    if env in ("f64", "float64"):
        enable_x64()
        return F64
    platform = jax.default_backend()
    if platform == "cpu":
        enable_x64()
        return F64
    return F32


def enable_x64() -> None:
    jax.config.update("jax_enable_x64", True)
