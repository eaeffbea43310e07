"""Clinical parity protocols (eval/parity.py): geometry laws, protocol
exactness with ground-truth predictions, and CLI smoke."""

import numpy as np
import pytest

from gdkvm_tpu.eval import parity


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r)


def test_long_axis_of_ellipse():
    # Axis-aligned ellipse: long axis ≈ 2·ry (vertical major axis).
    yy, xx = np.mgrid[0:128, 0:128]
    m = ((yy - 64) / 40.0) ** 2 + ((xx - 64) / 15.0) ** 2 <= 1.0
    length = parity.lv_long_axis_px(m)
    assert abs(length - 80) < 4


def test_volume_area_length_scales_cubically():
    # V = 8A²/(3πL): doubling the radius scales A by 4, L by 2 → V by 8.
    v1 = parity.lv_volume_area_length(_disk(256, 256, 128, 128, 20))
    v2 = parity.lv_volume_area_length(_disk(256, 256, 128, 128, 40))
    assert v1 > 0
    assert abs(v2 / v1 - 8.0) < 0.5
    assert parity.lv_volume_area_length(np.zeros((8, 8), bool)) == 0.0


def test_long_axis_physical_spacing():
    """Anisotropic spacing changes BOTH the axis direction and its length:
    a pixel-tall mask whose physical pixels are short in y can have its
    true long axis along x."""
    yy, xx = np.mgrid[0:128, 0:128]
    m = ((yy - 64) / 40.0) ** 2 + ((xx - 64) / 15.0) ** 2 <= 1.0
    # Isotropic spacing scales the pixel answer linearly.
    iso = parity.lv_long_axis_px(m, spacing=(0.5, 0.5))
    assert iso == pytest.approx(parity.lv_long_axis_px(m) * 0.5, rel=1e-9)
    # sy ≪ sx: physically the mask is 80·0.1=8 mm tall, 30·1.0=30 mm wide
    # — the long axis flips to x.
    flipped = parity.lv_long_axis_px(m, spacing=(0.1, 1.0))
    assert abs(flipped - 30.0) < 2.0


def test_volume_physical_units_ml():
    """V = 8A²/(3πL) in mm³ under (sy,sx) spacing: isotropic s scales the
    pixel-unit volume by s³ (A² ∝ s⁴, L ∝ s)."""
    m = _disk(256, 256, 128, 128, 30)
    v_px = parity.lv_volume_area_length(m)
    v_mm = parity.lv_volume_area_length(m, spacing=(0.5, 0.5))
    assert v_mm == pytest.approx(v_px * 0.5 ** 3, rel=1e-6)
    assert parity.MM3_PER_ML == 1000.0
    # Anisotropic spacing does NOT cancel in EF: squash y by 2× and EF
    # inputs change by more than a common factor (ratio of two volumes at
    # different shapes differs between px and mm scoring).
    m2 = _disk(256, 256, 128, 128, 20)
    r_px = parity.lv_volume_area_length(m) / parity.lv_volume_area_length(m2)
    r_mm = (parity.lv_volume_area_length(m, spacing=(0.5, 1.0))
            / parity.lv_volume_area_length(m2, spacing=(0.5, 1.0)))
    # Disks stay self-similar, so the ratio is preserved here…
    assert r_mm == pytest.approx(r_px, rel=1e-6)
    # …but an eccentric mask vs a disk is not: anisotropy reweights them.
    yy, xx = np.mgrid[0:256, 0:256]
    ell = ((yy - 128) / 60.0) ** 2 + ((xx - 128) / 15.0) ** 2 <= 1.0
    r_px = (parity.lv_volume_area_length(ell)
            / parity.lv_volume_area_length(m2))
    r_mm = (parity.lv_volume_area_length(ell, spacing=(0.25, 1.0))
            / parity.lv_volume_area_length(m2, spacing=(0.25, 1.0)))
    assert abs(r_mm - r_px) / r_px > 0.05


def test_beatwise_ef_fps_aware():
    """The beat-separation window is a TIME, not a frame count: the same
    trace declared at a high FPS (so 0.3 s spans more frames than the
    trace) falls back to single-beat, while the true FPS segments it."""
    t = np.arange(72)
    vols = 100 + 40 * np.cos(2 * np.pi * t / 24.0)   # beats every 24 frames
    ef_native, n_native = parity.beatwise_ef(vols, smooth=1, fps=25.0)
    assert n_native >= 2
    assert ef_native == pytest.approx(100 * (140 - 60) / 140, abs=1.5)
    _, n_fast = parity.beatwise_ef(vols, smooth=1, fps=2000.0)
    assert n_fast == 1
    # Without fps the legacy fixed-frame rule applies unchanged.
    ef_legacy, n_legacy = parity.beatwise_ef(vols, smooth=1)
    assert n_legacy >= 2 and ef_legacy == pytest.approx(ef_native, abs=1e-9)


def test_detect_ed_es_on_sine_trace():
    t = np.arange(48)
    vols = 100 + 40 * np.cos(2 * np.pi * t / 24.0)   # beats at t=0,24
    i_ed, i_es = parity.detect_ed_es(vols)
    assert i_ed % 24 == 0
    assert i_es % 24 == 12


def test_ef_from_volumes():
    assert parity.ef_from_volumes(100.0, 40.0) == pytest.approx(60.0)
    assert parity.ef_from_volumes(0.0, 0.0) == 0.0


def test_dice_bin_degenerate():
    a = np.zeros((4, 4), bool)
    assert parity.dice_bin(a, a) == 1.0
    b = a.copy()
    b[0, 0] = True
    assert parity.dice_bin(a, b) < 0.1


def _camus_cfg(tmp_path, image_size=64):
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data.camus import materialize_synthetic_camus
    root = str(tmp_path / "camus")
    materialize_synthetic_camus(root, num_train=2, num_val=4,
                                image_size=image_size, clip_len=6,
                                num_classes=4)
    return load_config(None, [
        f"data.data_path={root}", "data.dataset=camus",
        f"data.image_size={image_size}", "data.clip_len=6",
        "model.num_classes=4",
        f"runtime.run_dir={tmp_path}/run",
    ])


def test_camus_protocol_exact_on_ground_truth(tmp_path):
    """Feeding GT through the protocol must read Dice 1.0 / HD95 0.0 —
    the protocol-exactness guarantee real-data parity runs rely on."""
    cfg = _camus_cfg(tmp_path)
    from gdkvm_tpu.data.camus import CamusDataset
    ds = CamusDataset(cfg.data.data_path, "val", image_size=64,
                      clip_len=6, num_classes=4)
    gt_by_order = {}
    for i in range(len(ds)):
        _, m, _ = ds[i]
        gt_by_order[i] = m
    calls = {"n": 0}

    def predict_fn(frames):
        b = frames.shape[0]
        lo = calls["n"]
        calls["n"] += b
        out = []
        for j in range(b):
            idx = min(lo + j, len(ds) - 1)   # tail padding repeats last
            out.append(gt_by_order[idx])
        return np.stack(out)

    res = parity.camus_official(cfg, model=None, params=None, split="val",
                                batch_size=4, predict_fn=predict_fn)
    assert res["n_patients"] >= 2
    for view in res["per_structure"].values():
        for structure in view.values():
            for cell in structure.values():
                assert cell["dice_mean"] == pytest.approx(1.0, abs=1e-6)
                if "hd95_mean" in cell:
                    assert cell["hd95_mean"] == pytest.approx(0.0)
    assert "| View | Structure |" in res["table"]
    assert res["dice_mean_overall"] == pytest.approx(1.0, abs=1e-6)
    # The synthetic materializer declares physical spacing, so the run
    # scores HD95 in millimetres — the paper-table unit (VERDICT r2 #1).
    assert res["hd95_units"] == "mm"
    assert "HD95 ED (mm)" in res["table"]


def test_camus_protocol_with_model(tmp_path):
    """Protocol runs end-to-end through an (untrained) model forward."""
    import jax
    from gdkvm_tpu.models.gdkvm import GDKVM, init_params
    cfg = _camus_cfg(tmp_path, image_size=48)
    cfg.model.enc_channels = (8, 16, 24, 32)
    cfg.model.num_heads = 2
    cfg.model.head_dim_k = 8
    cfg.model.head_dim_v = 8
    model = GDKVM(cfg=cfg.model)
    params = init_params(model, jax.random.PRNGKey(0), 48)
    res = parity.camus_official(cfg, model, params, split="val",
                                batch_size=2, with_hd95=False,
                                max_patients=2)
    assert res["n_patients"] == 2
    assert 0.0 <= res["dice_mean_overall"] <= 1.0


def test_echonet_ef_exact_on_ground_truth(tmp_path):
    """GT masks through the EF protocol must reproduce the materializer's
    EF labels (same area–length rule) to float precision."""
    cv2 = pytest.importorskip("cv2")
    from gdkvm_tpu.config.schema import load_config
    from gdkvm_tpu.data import synthetic
    from gdkvm_tpu.data.echonet import materialize_synthetic_echonet
    root = str(tmp_path / "echonet")
    materialize_synthetic_echonet(root, num_train=1, num_val=3,
                                  num_frames=24, image_size=64, seed=5)
    labels = parity.read_ef_labels(root)
    assert len(labels) == 4
    cfg = load_config(None, [
        f"data.data_path={root}", "data.dataset=echonet",
        "data.image_size=64", "model.num_classes=2",
        f"runtime.run_dir={tmp_path}/run",
    ])

    def segment_fn(video, name):
        i = int(name.replace("synth", "").replace(".avi", ""))
        _, masks = synthetic.generate_video(5 * 104729 + i,
                                            video.shape[0], 64, 64, 2)
        return masks

    res = parity.echonet_ef(cfg, model=None, params=None, split="VAL",
                            segment_fn=segment_fn)
    assert res["n_scored"] == 3
    assert res["ef_mae"] == pytest.approx(0.0, abs=1e-3)
    assert "| Metric | Value |" in res["table"]


def test_parity_cli_camus(tmp_path, capsys):
    import json
    from gdkvm_tpu.cli import main
    from gdkvm_tpu.data.camus import materialize_synthetic_camus
    root = str(tmp_path / "camus")
    materialize_synthetic_camus(root, num_train=1, num_val=2,
                                image_size=48, clip_len=4, num_classes=4)
    rc = main(["parity", "--no-hd95", "--max-patients", "1",
               f"data.data_path={root}", "data.dataset=camus",
               "data.image_size=48", "data.clip_len=4",
               "model.num_classes=4",
               "model.enc_channels=[8,16,24,32]", "model.num_heads=2",
               "model.head_dim_k=8", "model.head_dim_v=8",
               f"runtime.run_dir={tmp_path}/run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["protocol"] == "camus_official_ed_es_per_patient"
    assert out["n_patients"] == 1


def test_beatwise_ef_multibeat_trace():
    """Three identical beats → per-beat EFs average to the single-beat EF;
    beat segmentation finds the minima."""
    t = np.arange(72)
    vols = 100 + 40 * np.cos(2 * np.pi * t / 24.0)   # ED=140, ES=60
    ef, n_beats = parity.beatwise_ef(vols, smooth=1)
    assert n_beats >= 2
    assert ef == pytest.approx(100 * (140 - 60) / 140, abs=1.5)
    # Short trace falls back to global extremes.
    ef1, n1 = parity.beatwise_ef(vols[:10], smooth=1)
    assert n1 == 1 and ef1 > 0


def test_camus_fold_rule():
    from gdkvm_tpu.data.camus_raw import camus_fold
    # Balanced deterministic assignment: 500 patients → 50 per fold.
    counts = np.zeros(10, int)
    for i in range(1, 501):
        counts[camus_fold(f"patient{i:04d}", 10)] += 1
    assert (counts == 50).all()
    assert camus_fold("patient0001", 10) == 0
    assert camus_fold("patient0011", 10) == 0
    assert camus_fold("patient0010", 10) == 9


def test_camus_kfold_protocol(tmp_path):
    """k-fold aggregation: every patient scored exactly once across folds,
    GT exactness holds per fold, headline is mean±std over folds."""
    cfg = _camus_cfg(tmp_path)
    from gdkvm_tpu.data.camus import CamusDataset
    ds = CamusDataset(cfg.data.data_path, "val", image_size=64,
                      clip_len=6, num_classes=4)
    gt = {i: ds[i][1] for i in range(len(ds))}
    order = {"seen": []}

    def predict_fn(frames):
        # The fold runs re-enumerate the dataset; mirror camus_official's
        # sequential-chunk order within each fold call by replaying GT in
        # dataset order filtered per call — easiest exact oracle: look the
        # clip up by frame content.
        out = []
        for f in frames:
            match = next(i for i in gt
                         if np.array_equal(ds[i][0], f))
            out.append(gt[match])
            order["seen"].append(match)
        return np.stack(out)

    res = parity.camus_official_folds(cfg, model=None, params=None,
                                      folds=2, split="val",
                                      predict_fn=predict_fn, batch_size=2)
    assert res["n_folds_scored"] == 2
    assert res["dice_mean_overall"] == pytest.approx(1.0, abs=1e-6)
    assert res["dice_std_over_folds"] == pytest.approx(0.0, abs=1e-6)
    # Each patient lands in exactly one fold; all patients covered.
    assert res["n_patients"] == 2
    assert "mean ± std" in res["table"]
    assert res["hd95_units"] == "mm"
    assert res["hd95_mean_overall"] == pytest.approx(0.0)


def test_biplane_volume_rules():
    # Sphere-ish sanity: equal views, V = 8 A² / (3πL).
    v = parity.biplane_volume(100.0, 100.0, 20.0, 25.0)
    assert v == pytest.approx(8 * 100 * 100 / (3 * np.pi * 20))
    assert parity.biplane_volume(10, 10, 0.0, 5.0) == 0.0


def test_camus_ef_exact_on_ground_truth(tmp_path):
    """GT through the biplane-Simpson protocol ⇒ EF MAE exactly 0 (pred
    and reference run the identical rule)."""
    cfg = _camus_cfg(tmp_path)
    from gdkvm_tpu.data.camus import CamusDataset
    ds = CamusDataset(cfg.data.data_path, "val", image_size=64,
                      clip_len=6, num_classes=4)
    calls = {"n": 0}

    def predict_fn(frames):
        b = frames.shape[0]
        lo = calls["n"]
        calls["n"] += b
        return np.stack([ds[min(lo + j, len(ds) - 1)][1]
                         for j in range(b)])

    res = parity.camus_ef(cfg, model=None, params=None, split="val",
                          batch_size=4, predict_fn=predict_fn)
    assert res["n_patients"] >= 1
    assert res["ef_mae"] == pytest.approx(0.0, abs=1e-9)
    assert all(0 <= r["ef_ref"] <= 100 for r in res["per_patient"])
    # Declared spacing ⇒ biplane volumes reported in mL per patient.
    assert res["volume_units"] == "mL"
    assert all(r["v_ed_ml"] > 0 for r in res["per_patient"])


def test_memory_ablation_cli(tmp_path, capsys):
    """parity --ablate: the 2x2 memory study runs end-to-end on a tiny
    synthetic config and reports all four conditions + both deltas."""
    import json
    from gdkvm_tpu.cli import main
    rc = main(["parity", "--ablate", "--ablate-videos", "2",
               "--ablate-video-len", "8",
               "data.dataset=synthetic", "data.image_size=32",
               "data.synth_difficulty=0.7",
               "model.num_classes=4",
               "model.enc_channels=[8,16,24,32]", "model.num_heads=2",
               "model.head_dim_k=8", "model.head_dim_v=8",
               f"runtime.run_dir={tmp_path}/run"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["protocol"] == "memory_ablation_2x2"
    assert set(out["conditions"]) == {
        "clean_carry", "clean_reset", "occluded_carry", "occluded_reset",
        "clean_carry_window", "clean_reset_window",
        "occluded_carry_window", "occluded_reset_window"}
    for name, cond in out["conditions"].items():
        assert 0.0 <= cond["dice_fg_mean"] <= 1.0
        if name.endswith("_window"):
            # probe-window scoring restricts validity to the 4 probe frames
            assert cond["frames"] < out["conditions"][
                name[: -len("_window")]]["frames"]
    for key in ("memory_delta_clean", "memory_delta_occluded",
                "memory_delta_clean_window", "memory_delta_occluded_window"):
        assert key in out
