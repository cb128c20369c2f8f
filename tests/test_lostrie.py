"""los_trie ≡ viewshed_batch on random height fields — the exactness
bridge behind the q_viewshed_flat SQL oracle."""

from __future__ import annotations

import numpy as np

from greenexp_r_spark.kernels import lostrie
from greenexp_r_spark.kernels.vgvi import viewshed_batch


def test_trie_matches_kernel_random_fields():
    rng = np.random.RandomState(7)
    for r in (5, 12, 20):
        nc = 2 * r + 1
        for trial in range(4):
            h = np.where(rng.rand(nc * nc) < 0.25,
                         rng.randint(3, 12, nc * nc).astype(float), 0.0)
            h0 = 1.7 + h[r * nc + r] * (trial % 2)   # active + inactive
            kern = viewshed_batch(h[None, :], np.array([h0]), r)[0]
            trie = lostrie.trie_visibility(h, h0, r)
            assert (kern == trie).all(), (r, trial)


def test_trie_parents_precede_children():
    nid, parent, dx, dy = lostrie.los_trie(8)
    assert (parent < nid).all()
    assert (np.abs(dx) <= 8).all() and (np.abs(dy) <= 8).all()
