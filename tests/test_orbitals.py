"""Orbital basis tests (shapes + exact enumeration properties)."""

import numpy as np

from coulombgas_tpu import manybody_orbitals, sp_orbitals, twist_sort


def test_sp_orbitals_shapes_and_order():
    for dim in (2, 3):
        indices, Es = sp_orbitals(dim)
        assert indices.shape == (Es.size, dim)
        assert np.all(np.diff(Es) >= 0)
        assert np.array_equal(Es, np.sum(indices**2, axis=-1))
        # every orbital is unique
        assert len({tuple(i) for i in indices}) == Es.size


def test_sp_orbitals_known_counts():
    # 2D, Emax=25: lattice points in a disk of radius 5 -> 81 (Gauss circle).
    _, Es = sp_orbitals(2, 25)
    assert Es.size == 81
    # 3D, Emax=1: origin + 6 unit vectors.
    _, Es3 = sp_orbitals(3, 1)
    assert Es3.size == 7


def test_twist_sort():
    indices, _ = sp_orbitals(2, 9)
    twist = np.array([0.25, 0.25])
    tw_indices, tw_Es = twist_sort(indices, twist)
    assert np.all(np.diff(tw_Es) >= 0)
    assert np.allclose(np.sum(tw_indices**2, axis=-1), tw_Es)
    # twisted indices are original + twist (as a set)
    orig = {tuple(i) for i in (indices + twist).round(6)}
    new = {tuple(i) for i in tw_indices.round(6)}
    assert orig == new


def test_manybody_orbitals_bruteforce():
    """Cross-check the DFS enumeration against itertools brute force."""
    import itertools

    n, dim, Ecut = 3, 2, 4
    indices, Es = sp_orbitals(dim)
    E0 = Es[:n].sum()
    # brute force over the first K orbitals (safe since energies sorted)
    K = np.searchsorted(Es, E0 + Ecut, side="right")
    expected = sorted(
        Es[list(c)].sum()
        for c in itertools.combinations(range(K), n)
        if Es[list(c)].sum() <= E0 + Ecut
    )
    mb_idx, mb_Es = manybody_orbitals(n, dim, Ecut)
    assert mb_idx.shape == (len(expected), n, dim)
    assert np.array_equal(mb_Es, np.array(expected))


def test_ordering_matches_reference_convention():
    """Pin the exact enumeration + tie-breaking order (reference parity).

    The VAN's token embeddings are the (twisted) momentum vectors, so the
    ordering of degenerate states is part of the checkpoint format: any
    permutation within a shell makes reference-trained parameters sample a
    different distribution.  These rows were generated with the reference's
    sp_orbitals/twist_sort (src/orbitals.py:22-55) at numpy's default
    argsort; they pin both the meshgrid axis order and the introsort
    tie-breaking.
    """
    indices, Es = sp_orbitals(2, 25)
    np.testing.assert_array_equal(
        indices[:9],
        [[0, 0], [0, -1], [-1, 0], [1, 0], [0, 1], [-1, -1], [1, -1], [-1, 1], [1, 1]],
    )
    twisted, Es_t = twist_sort(indices, np.array([0.25, 0.25]))
    np.testing.assert_allclose(
        twisted[:6],
        [[0.25, 0.25], [0.25, -0.75], [-0.75, 0.25], [-0.75, -0.75], [1.25, 0.25], [0.25, 1.25]],
    )
