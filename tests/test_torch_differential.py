"""End-to-end differential parity against torch reference semantics.

The reference ships neither datasets nor trained ``.pt`` files, so
accuracy parity on its checkpoints cannot be executed; what CAN be
proven end to end is decision parity: build reference-shaped torch
checkpoints in-test, feed them through the public CLI surface
(``run_pipeline_eval --*-checkpoint foo.pt``), and assert the CLI's
final labels are bit-identical to a torch-side replication of the
reference's own per-sample decision loops —
``pesquisa_v5/013_run_pipeline_eval.py:208-243`` (v5, including the
specialist-fallback branch 233-237) and
``pesquisa_v6/scripts/008_run_pipeline_eval_v6.py:69-127`` (v6 masked
subset routing). This converts the per-model logit parity of
``test_models.py`` into whole-pipeline, CLI-boundary parity.

Robustness note: jax and torch float32 logits differ at ~1e-6; final
labels can only flip where a decision margin is below that. The tests
assert bit-identity on every sample AND assert the minimum decision
margin of the run is comfortably above float noise, so a cross-host
numeric wiggle would fail loudly at the margin check, not silently at
label equality.
"""
import json
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

import tests.torch_reference as tr  # noqa: E402
from av1tpu.cli import run_pipeline_eval  # noqa: E402
from av1tpu.data.bundles import Bundle, save_split  # noqa: E402

STAGE1_THRESHOLD = 0.45
# v6: 10,240 val blocks (VERDICT r4 asked >= 10k); v5's model is tiny so
# it takes the same count without dominating the suite.
N_VAL = 10240


def _make_bundle(rng, n, v5=False, vary_qp=False):
    stage0 = rng.integers(0, 10 if v5 else 8, size=n).astype(np.int32)
    return Bundle(
        samples=rng.integers(0, 1024, size=(n, 16, 16, 1), dtype=np.uint16),
        qps=(
            rng.integers(30, 230, size=n).astype(np.int32)
            if vary_qp else np.full(n, 90, np.int32)
        ),
        labels={
            "stage0": stage0,
            "stage1": (stage0 != 0).astype(np.int32),
        },
    )


def _norm_torch(samples):
    x = torch.from_numpy(samples.astype(np.float32) / 1023.0)
    return x.permute(0, 3, 1, 2)  # NHWC -> NCHW


@pytest.fixture(scope="module")
def v6_setup(tmp_path_factory):
    """Torch v6 stage models + .pt checkpoints + a >=10k-block dataset."""
    root = tmp_path_factory.mktemp("torch_diff_v6")
    torch.manual_seed(20)
    models = {
        name: tr.torch_v6_stage(name)
        for name in ("stage1", "stage2", "rect", "ab")
    }
    paths = {}
    for name, m in models.items():
        m.eval()
        paths[name] = root / f"{name}.pt"
        # the reference trainers save {"model_state_dict": ...} payloads
        torch.save({"model_state_dict": m.state_dict()}, paths[name])

    rng = np.random.default_rng(21)
    dataset = root / "dataset"
    save_split(dataset, 16, _make_bundle(rng, 64), _make_bundle(rng, N_VAL), "v6")
    return models, paths, dataset, root


def _torch_v6_reference_predict(models, samples):
    """Replicate PipelineEvaluator.predict (008:69-127): sigmoid>=th gate,
    masked stage-2 subset, RECT/AB specialist subsets, id mapping
    0=NONE 1=SPLIT 2/3=RECT 4..7=AB. Returns (final, margins)."""
    x = _norm_torch(samples)
    n = x.shape[0]
    with torch.no_grad():
        s1_prob = torch.sigmoid(models["stage1"](x).squeeze(-1))
        final = torch.zeros(n, dtype=torch.long)
        margins = np.abs(s1_prob.numpy() - STAGE1_THRESHOLD)
        part_idx = (s1_prob >= STAGE1_THRESHOLD).nonzero(as_tuple=True)[0]
        if len(part_idx):
            s2_logits = models["stage2"](x[part_idx])
            top2 = torch.topk(s2_logits, 2, dim=1).values
            margins[part_idx.numpy()] = np.minimum(
                margins[part_idx.numpy()], (top2[:, 0] - top2[:, 1]).numpy()
            )
            s2_pred = torch.argmax(s2_logits, dim=1)
            final[part_idx[s2_pred == 0]] = 1  # SPLIT
            rect_idx = part_idx[s2_pred == 1]
            if len(rect_idx):
                r_logits = models["rect"](x[rect_idx])
                rt = torch.topk(r_logits, 2, dim=1).values
                margins[rect_idx.numpy()] = np.minimum(
                    margins[rect_idx.numpy()], (rt[:, 0] - rt[:, 1]).numpy()
                )
                final[rect_idx] = torch.argmax(r_logits, dim=1) + 2
            ab_idx = part_idx[s2_pred == 2]
            if len(ab_idx):
                a_logits = models["ab"](x[ab_idx])
                at = torch.topk(a_logits, 2, dim=1).values
                margins[ab_idx.numpy()] = np.minimum(
                    margins[ab_idx.numpy()], (at[:, 0] - at[:, 1]).numpy()
                )
                final[ab_idx] = torch.argmax(a_logits, dim=1) + 4
    return final.numpy(), margins


def test_v6_cli_final_labels_match_torch_reference_loop(v6_setup, tmp_path):
    models, paths, dataset, _ = v6_setup
    out = tmp_path / "v6_eval"
    run_pipeline_eval.main([
        "--variant", "v6",
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(out), "--batch-size", "2048",
        "--stage1-threshold", str(STAGE1_THRESHOLD),
        "--single-device", "--no-ab-fgvc",
        "--stage1-checkpoint", str(paths["stage1"]),
        "--stage2-checkpoint", str(paths["stage2"]),
        "--stage3-rect-checkpoint", str(paths["rect"]),
        "--stage3-ab-checkpoint", str(paths["ab"]),
    ])
    got = np.load(out / "pipeline_predictions_val.npz")
    val = Bundle.load(Path(dataset) / "block_16" / "val.npz")
    want, margins = _torch_v6_reference_predict(models, val.samples)

    assert len(got["predictions"]) == N_VAL
    np.testing.assert_array_equal(got["predictions"], want)
    # every decision sits comfortably above jax-vs-torch float noise, so
    # the equality above is numerically robust, not a coincidence
    assert margins.min() > 1e-4, margins.min()
    # stage-1 probabilities agree to float tolerance through the CLI
    x = _norm_torch(val.samples)
    with torch.no_grad():
        ref_prob = torch.sigmoid(models["stage1"](x).squeeze(-1)).numpy()
    np.testing.assert_allclose(got["stage1_prob"], ref_prob, atol=5e-5)


@pytest.fixture(scope="module")
def v5_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("torch_diff_v5")
    torch.manual_seed(22)
    model = tr.TorchHierarchicalModel()
    model.eval()
    ckpt = root / "v5_hier.pt"
    torch.save({"model_state": model.state_dict()}, ckpt)
    rng = np.random.default_rng(23)
    dataset = root / "dataset"
    save_split(
        dataset, 16, _make_bundle(rng, 64, v5=True),
        _make_bundle(rng, N_VAL, v5=True), "v5",
    )
    return model, ckpt, dataset


# 013:157-162 tables: stage2 id order and per-head raw-label lists
V5_STAGE2_NAMES = ["NONE", "SPLIT", "RECT", "AB", "1TO4"]
V5_STAGE3_HEADS = {
    "RECT": [1, 2],          # HORZ, VERT raw ids
    "AB": [4, 5, 6, 7],      # HORZ_A..VERT_B
    "1TO4": [8, 9],          # HORZ_4, VERT_4
}


def _torch_v5_reference_loop(model, samples, available):
    """Literal replication of the reference's per-sample decision loop
    (013:208-243): threshold gate, stage-2 macro argmax, specialist argmax
    when available, FALLBACK to the group's first member when not."""
    x = _norm_torch(samples)
    with torch.no_grad():
        s1_logits, s2_logits, spec_logits = model(x)
        s1_prob = torch.sigmoid(s1_logits)
        s1_pred = (s1_prob >= STAGE1_THRESHOLD).long().numpy()
        s2_pred = torch.argmax(s2_logits, dim=1).numpy()
        spec_pred = {k: torch.argmax(v, dim=1).numpy() for k, v in spec_logits.items()}

        margins = np.abs(s1_prob.numpy() - STAGE1_THRESHOLD)
        s2_top2 = torch.topk(s2_logits, 2, dim=1).values.numpy()
        spec_top2 = {
            k: torch.topk(v, 2, dim=1).values.numpy() for k, v in spec_logits.items()
        }

    final = np.zeros(len(samples), dtype=np.int64)
    for i in range(len(samples)):
        if s1_pred[i] == 0:
            continue  # PARTITION_NONE
        margins[i] = min(margins[i], s2_top2[i, 0] - s2_top2[i, 1])
        macro = V5_STAGE2_NAMES[s2_pred[i]]
        if macro == "NONE":
            final[i] = 0
        elif macro == "SPLIT":
            final[i] = 3  # PARTITION_SPLIT raw id
        elif macro in available:
            margins[i] = min(
                margins[i], spec_top2[macro][i, 0] - spec_top2[macro][i, 1]
            )
            final[i] = V5_STAGE3_HEADS[macro][spec_pred[macro][i]]
        else:
            # 013:233-237 — specialist unavailable: group's first member
            final[i] = V5_STAGE3_HEADS[macro][0]
    return final, margins


@pytest.mark.parametrize(
    "available", [("RECT", "AB", "1TO4"), ("RECT",)],
    ids=["all_specialists", "fallback_ab_1to4"],
)
def test_v5_cli_final_labels_match_torch_reference_loop(
    v5_setup, tmp_path, available
):
    model, ckpt, dataset = v5_setup
    out = tmp_path / "v5_eval"
    run_pipeline_eval.main([
        "--variant", "v5",
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(out), "--batch-size", "4096",
        "--stage1-threshold", str(STAGE1_THRESHOLD),
        "--single-device",
        "--v5-checkpoint", str(ckpt),
        "--available-specialists", *available,
    ])
    got = np.load(out / "pipeline_predictions_val.npz")
    val = Bundle.load(Path(dataset) / "block_16" / "val.npz")
    want, margins = _torch_v5_reference_loop(model, val.samples, available)

    assert len(got["predictions"]) == N_VAL
    np.testing.assert_array_equal(got["predictions"], want)
    assert margins.min() > 1e-4, margins.min()
    if available == ("RECT",):
        # the fallback branch actually fired: AB-routed samples all landed
        # on the group's first member (HORZ_A=4), never deeper AB ids; a
        # 1TO4-routed sample (if the random stage-2 produces any) may only
        # land on HORZ_4=8, never VERT_4=9
        assert (want == 4).any()
        assert not np.isin(want, (5, 6, 7, 9)).any()


def test_routing_edge_semantics_match_reference_at_exact_ties():
    """Decision-boundary semantics pinned on synthetic logits: a stage-1
    probability EXACTLY at threshold routes to partition (>= in both
    013:195 and the pipelines), and exact argmax ties resolve to the
    first index in torch and jax alike."""
    import jax

    from av1tpu.eval.hierarchy import v6_route

    # stage1 prob exactly at threshold -> gated IN (>=); the neighbor one
    # float32 ulp below stays OUT (both runtimes compare in float32)
    prob = np.array(
        [STAGE1_THRESHOLD, np.nextafter(np.float32(STAGE1_THRESHOLD),
                                        np.float32(0.0))],
        dtype=np.float32,
    )
    torch_gate = (torch.from_numpy(prob) >= STAGE1_THRESHOLD).long().numpy()
    jax_gate = np.asarray(
        (jnp.asarray(prob) >= STAGE1_THRESHOLD).astype(jnp.int32)
    )
    np.testing.assert_array_equal(torch_gate, jax_gate)
    np.testing.assert_array_equal(torch_gate, [1, 0])

    # exact two-way and four-way logit ties -> first max index everywhere
    ties = np.array([
        [0.5, 0.5, 0.1, 0.1],
        [0.2, 0.7, 0.7, 0.0],
        [1.0, 1.0, 1.0, 1.0],
        [-3.0, -3.0, 2.0, 2.0],
    ], dtype=np.float32)
    t_arg = torch.argmax(torch.from_numpy(ties), dim=1).numpy()
    j_arg = np.asarray(jnp.argmax(jnp.asarray(ties), axis=1))
    np.testing.assert_array_equal(t_arg, j_arg)
    np.testing.assert_array_equal(t_arg, [0, 1, 0, 2])

    # and the composed route agrees with a literal 008-loop transcription
    s1 = np.array([0, 1, 1, 1, 1], np.int32)
    s2 = np.array([2, 0, 1, 2, 1], np.int32)
    rect = np.array([1, 0, 0, 1, 1], np.int32)
    ab = np.array([3, 2, 1, 0, 0], np.int32)
    got = np.asarray(v6_route(*(jnp.asarray(a) for a in (s1, s2, rect, ab))))
    want = []
    for i in range(len(s1)):
        if s1[i] == 0:
            want.append(0)
        elif s2[i] == 0:
            want.append(1)
        elif s2[i] == 1:
            want.append(rect[i] + 2)
        else:
            want.append(ab[i] + 4)
    np.testing.assert_array_equal(got, want)


def test_v5_qp_conditioned_cli_matches_torch(tmp_path):
    """QP-conditioned v5 (Q6): a use_qp checkpoint round-trips through the
    CLI — auto-detected from its qp_embed tree, per-sample QPs fed
    normalized (qp/255) — and the final labels stay bit-identical to the
    torch reference loop evaluated with the same QPs. A shuffled-QP
    control asserts the conditioning actually reaches the logits."""
    torch.manual_seed(24)
    model = tr.TorchHierarchicalModel(use_qp=True)
    model.eval()
    ckpt = tmp_path / "v5_qp.pt"
    torch.save({"model_state_dict": model.state_dict()}, ckpt)

    rng = np.random.default_rng(25)
    n = 4096
    dataset = tmp_path / "dataset"
    save_split(
        dataset, 16, _make_bundle(rng, 64, v5=True, vary_qp=True),
        _make_bundle(rng, n, v5=True, vary_qp=True), "v5",
    )
    out = tmp_path / "v5_qp_eval"
    run_pipeline_eval.main([
        "--variant", "v5",
        "--dataset-dir", str(dataset), "--block-size", "16",
        "--output-dir", str(out), "--batch-size", "2048",
        "--stage1-threshold", str(STAGE1_THRESHOLD),
        "--single-device",
        "--v5-checkpoint", str(ckpt),
    ])
    got = np.load(out / "pipeline_predictions_val.npz")
    val = Bundle.load(Path(dataset) / "block_16" / "val.npz")

    x = _norm_torch(val.samples)
    qp = torch.from_numpy(val.qps.astype(np.float32) / 255.0)
    with torch.no_grad():
        s1, s2, spec = model(x, qp)
        s1_pred = (torch.sigmoid(s1) >= STAGE1_THRESHOLD).long().numpy()
        s2_pred = torch.argmax(s2, dim=1).numpy()
        spec_pred = {k: torch.argmax(v, dim=1).numpy() for k, v in spec.items()}
        s1_shuf, _, _ = model(x, qp[torch.randperm(len(qp))])

    final = np.zeros(n, dtype=np.int64)
    for i in range(n):
        if s1_pred[i] == 0:
            continue
        macro = V5_STAGE2_NAMES[s2_pred[i]]
        if macro == "NONE":
            final[i] = 0
        elif macro == "SPLIT":
            final[i] = 3
        else:
            final[i] = V5_STAGE3_HEADS[macro][spec_pred[macro][i]]
    np.testing.assert_array_equal(got["predictions"], final)
    # conditioning is live: shuffling the QPs changes the logits
    assert np.abs(s1_shuf.numpy() - s1.numpy()).max() > 1e-3
