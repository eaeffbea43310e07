"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip behavior is tested without a cluster via XLA host-platform device
emulation (SURVEY.md §4.2d).  The dev image's sitecustomize imports jax at
interpreter startup (registering the TPU/axon PJRT plugin), so env vars alone
are too late here — use jax.config.update, which works any time before the
backend is first initialized.
"""

import os

import jax

_platform = os.environ.get("GDKVM_TEST_PLATFORM", "cpu")
jax.config.update("jax_platforms", _platform)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


# --- quick/slow tiers ------------------------------------------------------
# ``pytest -m quick`` is the <2 min local iteration loop on the 1-CPU
# container; the full suite (~28 min there) stays the CI gate.  Tests whose
# measured call time exceeded ~5 s are listed here by base name (durations
# from a clean full run, r2); everything else is auto-marked quick.

_SLOW_TESTS = frozenset({
    # test_gdr.py
    "test_model_gdn2_variant_trains", "test_chunked_matches_ref",
    "test_decoupled_erase_gate_laws", "test_gradients_flow",
    "test_streaming_equals_batched_core", "test_batched_head_wrapper",
    "test_beta_zero_is_pure_decay", "test_read_is_pre_write",
    "test_chunked_stable_with_correlated_keys_large_n",
    "test_assoc_matches_ref", "test_assoc_long_sequence_stable",
    "test_assoc_gradients_match_chunked", "test_assoc_decoupled_matches_ref",
    "test_model_forward_assoc_matches_chunked",
    # test_gdr_pallas.py
    "test_pallas_fuzz_shapes", "test_pallas_decoupled_gates",
    "test_pallas_fused_bwd_all_grads", "test_pallas_matches_ref",
    "test_pallas_fused_bwd_state_carry_chain", "test_pallas_grad_matches_ref",
    "test_pallas_chain_mode_matches_ref", "test_pallas_chain_mode_save_states",
    # test_sweep.py
    "test_sweep_grid", "test_sweep_bracket_values_not_swept_and_errors_contained",
    # test_parity.py
    "test_camus_protocol_with_model", "test_parity_cli_camus",
    # test_model.py
    "test_grad_through_model", "test_bf16_compute_path",
    "test_forward_shapes", "test_memory_affects_later_frames",
    "test_prompt_changes_output", "test_stem_variants",
    # test_train.py
    "test_overfit_single_clip", "test_gradient_accumulation_effective_batch",
    "test_resume_equals_straight_run", "test_ema_withheld_during_accumulation",
    "test_ema_tracking_and_eval_params", "test_loss_respects_validity",
    # test_export.py
    "test_export_roundtrip_matches_apply", "test_export_streaming_state_carry",
    "test_export_cli_roundtrip",
    # test_bench_contract.py
    "test_bench_prints_one_json_line", "test_latency_bench_mode",
    "test_train_bench_mode", "test_modules_bench_mode",
    # test_multihost.py / test_preproc.py
    "test_two_process_distributed_train_step",
    "test_infer_native_resolution_device_resize",
    # test_device_cache.py
    "test_cache_resume_exact", "test_video_cache_train_smoke",
    "test_train_loop_with_cache_learns", "test_video_cache_mode_and_sampling",
    # test_cli_pack.py / test_streaming.py / test_infer.py
    "test_pack_then_train", "test_stream_video_matches_batched",
    "test_infer_artifact_uses_exported_image_size",
    # test_evaluator.py
    "test_training_determinism", "test_evaluate_with_hd95",
    "test_prompted_streaming", "test_evaluate_sharded_over_mesh",
    "test_long_sequence_streaming_stable",
    # test_sharding.py
    "test_data_parallel_train_step", "test_data_parallel_matches_single_device",
    "test_ts8_subpixel_head_on_mesh",
    # r5 additions
    "test_bootstrapped_ce_grad_flows_and_trains",
    # r5 re-tiering (VERDICT r4 item 7): quick had drifted to 266 s; every
    # test that measured >~5 s on a clean solo run moves here.
    "test_bench_all_artifact_schema", "test_memory_ablation_cli",
    "test_two_scale_decoder_head", "test_group_norm_matches_flax",
    "test_export_quantized_model_roundtrip", "test_stored_bwd_bf16_residuals",
    "test_export_two_scale_decoder_roundtrip",
    "test_assoc_streaming_equals_batched", "test_pallas_streaming_state_carry",
    "test_prefetch_abandoned_consumer_stops_producer",
    # test_modulebench.py
    "test_grad_breakdown_rows_and_sanity", "test_grad_breakdown_without_optimizer",
    "test_grad_flops_exceed_forward_flops",
})


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: measured >~5 s on 1 CPU")
    config.addinivalue_line("markers", "quick: the <2 min iteration tier")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        base = item.name.split("[", 1)[0]
        if base in _SLOW_TESTS or item.get_closest_marker("slow"):
            item.add_marker(pytest.mark.slow)
        else:
            item.add_marker(pytest.mark.quick)
