"""Native C++ enumeration vs the pure-Python fallback."""

import numpy as np

import coulombgas_tpu.ops.native as native
from coulombgas_tpu.physics.orbitals import manybody_orbitals


def test_native_matches_python():
    if not native.native_available():
        import pytest

        pytest.skip("no C++ toolchain")
    mb_i, mb_E = manybody_orbitals(5, 2, 4)
    # force the Python path
    native._build_failed, saved = True, native._lib
    native._lib = None
    try:
        mb_i2, mb_E2 = manybody_orbitals(5, 2, 4)
    finally:
        native._build_failed, native._lib = False, saved
    assert np.array_equal(mb_E, mb_E2)
    s1 = {tuple(map(tuple, s)) for s in mb_i}
    s2 = {tuple(map(tuple, s)) for s in mb_i2}
    assert s1 == s2
