"""grad-mode modulebench: the train-step fwd+bwd per-module breakdown
(VERDICT r2 item 4) produces a complete, sane table at tiny shapes."""

import math

import jax
import numpy as np

from gdkvm_tpu.config.schema import load_config
from gdkvm_tpu.eval.modulebench import grad_breakdown, module_breakdown
from gdkvm_tpu.models.gdkvm import GDKVM, init_params, train_model_config
from gdkvm_tpu.train.loop import make_optimizer

CONFIG = "configs/smoke_synthetic.yaml"


def _tiny_model_and_params(image_size=32):
    cfg = load_config(CONFIG, [])
    model = GDKVM(cfg=train_model_config(cfg.model, image_size))
    params = init_params(model, jax.random.PRNGKey(0), image_size)
    return cfg, model, params


def test_grad_breakdown_rows_and_sanity():
    cfg, model, params = _tiny_model_and_params()
    res = grad_breakdown(model, params, image_size=32, chunk=4, batch=2,
                         reps=3, tx=make_optimizer(cfg))
    expect = {"encoder", "lkva_gdr", "decoder", "loss", "full_fwd_bwd",
              "optimizer", "train_step_total", "_meta"}
    assert set(res) == expect
    for name in expect - {"_meta"}:
        row = res[name]
        assert row["ms_per_call"] >= 0.0
        assert np.isfinite(row["flops_per_call"]), name
        assert row["flops_per_call"] > 0, name
    # fwd+bwd of the full model must carry more FLOPs than fwd-only rows,
    # and the total step at least as many as the loss-grad alone.
    assert (res["full_fwd_bwd"]["flops_per_call"]
            > res["loss"]["flops_per_call"])
    assert (res["train_step_total"]["flops_per_call"]
            >= res["full_fwd_bwd"]["flops_per_call"])
    assert res["_meta"]["mode"] == "grad"
    assert res["train_step_total"]["pct_of_step_time"] == 100.0


def test_grad_breakdown_without_optimizer():
    _, model, params = _tiny_model_and_params()
    res = grad_breakdown(model, params, image_size=32, chunk=2, batch=1,
                         reps=2, tx=None)
    assert "optimizer" not in res and "train_step_total" not in res
    # pct is referenced to full_fwd_bwd when no optimizer is given
    assert res["full_fwd_bwd"]["pct_of_step_time"] == 100.0


def test_grad_flops_exceed_forward_flops():
    """fwd+bwd FLOPs should be ~2-3x the forward's (grad graphs replay the
    matmuls twice more); a big shortfall means the bwd subgraph is wrong."""
    _, model, params = _tiny_model_and_params()
    fwd = module_breakdown(model, params, image_size=32, chunk=4, batch=2,
                           reps=2)
    _, model2, params2 = _tiny_model_and_params()
    grad = grad_breakdown(model2, params2, image_size=32, chunk=4, batch=2,
                          reps=2, tx=None)
    ratio = (grad["full_fwd_bwd"]["flops_per_call"]
             / fwd["full_model"]["flops_per_call"])
    assert 1.5 < ratio < 5.0, ratio
