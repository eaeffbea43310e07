"""Acoustic-dropout occlusion augmentation tests."""

import numpy as np

from gdkvm_tpu.data.pipeline import _augment, _occlude


def test_occlude_never_frame0_and_blanks_region():
    rng = np.random.default_rng(0)
    hits = 0
    for _ in range(50):
        frames = np.full((6, 32, 32, 1), 200, np.uint8)
        out = _occlude(rng, frames.copy(), occlude_prob=1.0)
        changed = np.where((out != 200).any(axis=(1, 2, 3)))[0]
        assert 0 not in changed, "frame 0 must stay clean (memory bootstrap)"
        assert len(changed) >= 1
        hits += 1
        # Blanked region is zeros.
        t = changed[0]
        assert (out[t] == 0).sum() > 0.1 * 32 * 32
    assert hits == 50


def test_occlude_prob_zero_is_identity():
    rng = np.random.default_rng(1)
    frames = np.random.default_rng(2).integers(0, 255, (4, 16, 16, 1),
                                               np.uint8)
    out = _occlude(rng, frames.copy(), occlude_prob=0.0)
    np.testing.assert_array_equal(out, frames)


def test_augment_threads_occlusion():
    rng = np.random.default_rng(3)
    frames = np.full((5, 24, 24, 1), 180, np.uint8)
    masks = np.zeros((5, 24, 24), np.uint8)
    blanked = 0
    for _ in range(30):
        f, m = _augment(np.random.default_rng(rng.integers(2 ** 31)),
                        frames.copy(), masks.copy(), occlude_prob=1.0)
        if (f == 0).sum() > 50:
            blanked += 1
    assert blanked == 30
