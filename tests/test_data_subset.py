"""Stratified train-subset sampling (the reference's 6%-fine-tune workflow,
reference README.md:12; here a first-class --train_subset flag)."""

import numpy as np
import pytest

from cnns_slfp_quantization_tpu.data import subset


def test_stratified_fraction_and_coverage():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 100, size=50_000).astype(np.int32)
    sel = subset.stratified_indices(labels, 0.06, seed=3)
    # ~6% with per-class ceil round-up
    assert 0.06 * len(labels) <= len(sel) <= 0.062 * len(labels)
    # every class represented, proportionally
    counts = np.bincount(labels[sel], minlength=100)
    full = np.bincount(labels, minlength=100)
    assert counts.min() >= 1
    np.testing.assert_array_equal(counts, np.ceil(0.06 * full).astype(int))
    # deterministic, sorted, no duplicates
    sel2 = subset.stratified_indices(labels, 0.06, seed=3)
    np.testing.assert_array_equal(sel, sel2)
    assert np.all(np.diff(sel) > 0)


def test_stratified_edge_cases():
    labels = np.asarray([0, 0, 0, 1, 1, 2], np.int32)
    np.testing.assert_array_equal(
        subset.stratified_indices(labels, 1.0), np.arange(6))
    sel = subset.stratified_indices(labels, 0.01, seed=0)
    assert len(sel) == 3  # one per class (ceil)
    assert set(labels[sel]) == {0, 1, 2}
    with pytest.raises(ValueError):
        subset.stratified_indices(labels, 0.0)
    with pytest.raises(ValueError):
        subset.stratified_indices(labels, 1.5)


def test_cifar_iterator_subset(tmp_path):
    # fabricate a cifar-100-python train/test pair on disk
    import pickle

    d = tmp_path / "cifar-100-python"
    d.mkdir()
    rng = np.random.default_rng(0)
    for name, n in (("train", 2000), ("test", 400)):
        with open(d / name, "wb") as f:
            pickle.dump({
                "data": rng.integers(0, 256, (n, 3072), dtype=np.uint8),
                "fine_labels": list(rng.integers(0, 100, n)),
            }, f)
    from cnns_slfp_quantization_tpu.data import cifar as cifar_data

    tr, ev = cifar_data.make_iterators(str(tmp_path), 100, 64, 64,
                                       train_subset=0.1)
    assert len(tr.images) < 2000 * 0.13
    assert len(ev.images) == 400  # eval set never subsampled
    x, y = next(iter(tr))
    assert x.shape == (64, 32, 32, 3) and y.shape == (64,)
