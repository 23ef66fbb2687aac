"""Data-layer tests: splits, bundles, filters, sampling."""
import numpy as np
import pytest

from av1tpu.data import (
    BlockSet,
    Bundle,
    balanced_epoch_indices,
    build_flatten_bundle,
    build_v5_bundle,
    build_v6_bundle,
    effective_number_weights,
    ensemble_shuffles,
    filter_partitioned_only,
    filter_stage2_v6,
    filter_stage3,
    oversample_ab,
    oversample_indices,
    save_split,
    train_test_split,
)
from av1tpu.data.bundles import bundle_metadata


def make_record(labels, seed=0):
    labels = np.asarray(labels, dtype=np.int32)
    n = len(labels)
    rng = np.random.default_rng(seed)
    return BlockSet(
        samples=rng.integers(0, 1024, size=(n, 16, 16, 1), dtype=np.uint16),
        labels=labels,
        qps=np.full(n, 80, dtype=np.int32),
    )


def test_split_matches_reference_permutation():
    """The split must use np.random.default_rng(seed).permutation exactly,
    so splits are reproducible against reference-derived datasets."""
    record = make_record(np.zeros(100, dtype=np.int32))
    train, val = train_test_split(record, test_ratio=0.2, seed=42)
    idx = np.random.default_rng(42).permutation(100)
    np.testing.assert_array_equal(train.samples, record.samples[idx[:80]])
    np.testing.assert_array_equal(val.samples, record.samples[idx[80:]])


def test_v6_bundle_views():
    record = make_record([0, 1, 3, 4, 9])
    b = build_v6_bundle(record)
    np.testing.assert_array_equal(b.labels["stage1"], [0, 1, 1, 1, 1])
    np.testing.assert_array_equal(b.labels["stage2"], [-1, 1, 0, 2, -1])
    np.testing.assert_array_equal(b.labels["stage3_RECT"], [-1, 0, -1, -1, -1])
    np.testing.assert_array_equal(b.labels["stage3_AB"], [-1, -1, -1, 0, -1])


def test_v5_bundle_has_1to4_head():
    b = build_v5_bundle(make_record([8, 9]))
    np.testing.assert_array_equal(b.labels["stage3_1TO4"], [0, 1])
    np.testing.assert_array_equal(b.labels["stage2"], [4, 4])


def test_flatten_bundle_drops_none():
    b = build_flatten_bundle(make_record([0, 1, 2, 3, 0, 7]))
    assert len(b) == 4
    np.testing.assert_array_equal(b.labels["flatten"], [0, 1, 2, 6])


def test_filters():
    b = build_v6_bundle(make_record([0, 1, 3, 4, 9, 0]))
    assert len(filter_partitioned_only(b)) == 4
    assert len(filter_stage2_v6(b)) == 3
    assert len(filter_stage3(b, "RECT")) == 1
    assert len(filter_stage3(b, "AB")) == 1


def test_oversample_ab_matches_reference_factors():
    # labels: AB head ids after filter; factors {1:5, 2:5} = {HORZ_B, VERT_A}
    record = make_record([4, 5, 6, 7])  # HORZ_A, HORZ_B, VERT_A, VERT_B
    b = filter_stage3(build_v6_bundle(record), "AB")
    over = oversample_ab(b, {1: 5, 2: 5})
    counts = np.bincount(over.labels["stage3_AB"], minlength=4)
    np.testing.assert_array_equal(counts, [1, 5, 5, 1])


def test_oversample_indices_order():
    idx = oversample_indices(np.array([0, 1, 0]), {1: 3})
    np.testing.assert_array_equal(idx, [0, 1, 1, 1, 2])


def test_ensemble_shuffles_are_distinct_and_seeded():
    b = build_v6_bundle(make_record(np.tile([4, 5, 6, 7], 10)))
    members = ensemble_shuffles(b, num_members=3, seed=42)
    assert len(members) == 3
    again = ensemble_shuffles(b, num_members=3, seed=42)
    for m, a in zip(members, again):
        np.testing.assert_array_equal(m.samples, a.samples)
    assert not np.array_equal(members[0].samples, members[1].samples)


def test_effective_number_weights_formula():
    counts = np.array([1000, 500, 200])
    beta = 0.9999
    eff = 1.0 - np.power(beta, counts)
    expected = (1.0 - beta) / eff
    expected = expected / expected.sum() * 3
    np.testing.assert_allclose(
        effective_number_weights(counts, beta), expected, rtol=1e-6
    )


def test_balanced_epoch_indices_balances_classes():
    labels = np.array([0] * 900 + [1] * 100)
    idx = balanced_epoch_indices(labels, epoch_seed=7)
    assert len(idx) == 1000
    frac_minority = (labels[idx] == 1).mean()
    assert 0.4 < frac_minority < 0.6  # inverse-frequency => ~50/50


def test_bundle_save_load_roundtrip(tmp_path):
    record = make_record([0, 1, 3, 4])
    train = build_v6_bundle(record)
    val = build_v6_bundle(make_record([3, 7]))
    root = save_split(tmp_path, 16, train, val, "v6")
    loaded = Bundle.load(root / "train.npz")
    np.testing.assert_array_equal(loaded.samples, train.samples)
    np.testing.assert_array_equal(loaded.labels["stage2"], train.labels["stage2"])
    meta = (root / "metadata.json").read_text()
    assert "stage2_counts" in meta


def test_bundle_metadata_counts():
    train = build_v6_bundle(make_record([0, 1, 1, 3, 4, 5, 6, 7]))
    val = build_v6_bundle(make_record([0, 3]))
    meta = bundle_metadata(train, val, "v6", 16)
    assert meta["train"]["stage1_counts"] == [1, 7]
    assert meta["train"]["stage2_counts"] == [1, 2, 4]
    assert meta["train"]["stage3_AB_counts"] == [1, 1, 1, 1]


def test_host_shard_contract():
    from av1tpu.data.sampling import balanced_epoch_indices, host_shard

    labels = np.array([0] * 90 + [1] * 10)
    # every "host" derives the identical global order from the seed
    global_a = balanced_epoch_indices(labels, epoch_seed=3)
    global_b = balanced_epoch_indices(labels, epoch_seed=3)
    np.testing.assert_array_equal(global_a, global_b)
    shards = [host_shard(global_a, i, 4) for i in range(4)]
    assert all(len(s) == 25 for s in shards)
    np.testing.assert_array_equal(np.concatenate(shards), global_a[:100])
    with pytest.raises(ValueError):
        host_shard(global_a, 4, 4)


def test_load_torch_bundle_compat(tmp_path):
    """Reference train.pt/val.pt bundles load as numpy with NCHW->NHWC."""
    torch = pytest.importorskip("torch")
    from av1tpu.data import load_torch_bundle

    payload = {
        "samples": torch.rand(10, 1, 16, 16),
        "labels_stage0": torch.randint(0, 8, (10,)),
        "qps": torch.full((10,), 80.0),
        "note": "metadata string",
    }
    torch.save(payload, tmp_path / "val.pt")
    arrays, meta = load_torch_bundle(tmp_path / "val.pt")
    assert arrays["samples"].shape == (10, 16, 16, 1)
    assert arrays["labels_stage0"].shape == (10,)
    assert meta["note"] == "metadata string"
