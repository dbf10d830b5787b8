"""Test configuration: force a virtual 8-device CPU mesh so sharding tests run anywhere.

Mirrors the reference's (absent) hermetic test setup; see SURVEY.md §4 for why we add
CPU-backend multi-device tests that the reference lacks.
"""
import os

# Must be set before jax is imported anywhere. The environment may preset
# JAX_PLATFORMS=axon (a TPU tunnel); tests must run hermetically on CPU, so
# force-override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: this box has a single CPU core, so XLA compiles
# dominate test wall-clock; the cache removes recompiles both across runs and
# for re-jitted-but-identical programs within one run.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax_compilation")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# ---------------------------------------------------------------------------
# Fast test tier (VERDICT r4 item 10). The full suite takes ~45 min on this
# 1-CPU host (compile-dominated); round 3 shipped a breaking asset because the
# suite wasn't re-run before an end-of-round commit. Per-commit gate:
#
#     python -m pytest tests/ -q -m "not slow"      (< 5 min)
#
# Full suite (no -m filter) still runs once per round. The list below is
# DATA-DERIVED: every test whose call+setup time was >= 5 s in the round-5
# full-suite run (/tmp durations, warm compile cache). Re-derive with
# `pytest --durations=0` if it drifts.
import pytest  # noqa: E402

SLOW_TESTS = {
    "test_tools/test_pose3d_multi.py::test_keypoint_cam_init_recovers_camera",
    "test_tools/test_pose3d_multi.py::test_multi_init_rescues_bad_spin_init",
    "test_tools/test_pose3d_multi.py::test_multi_init_keeps_good_init",
    "test_models/test_flow_composition.py::test_identity_flow_roundtrip",
    "test_models/test_flow_composition.py::test_morph_fill_covers_wide_ring_512",
    "test_models/test_flow_composition.py::test_render_smpl_info_shapes",
    "test_models/test_imitator.py::test_prepare_targets_matches_source_framing",
    "test_models/test_imitator.py::test_setup_source_and_synthesize",
    "test_models/test_imitator.py::test_swapper_merge",
    "test_models/test_imitator.py::test_synthesize_temporal",
    "test_models/test_imitator.py::test_temporal_fused_inputs_match_fallback",
    "test_models/test_inception_lpips.py::test_evaluate_frames_metric_keys",
    "test_models/test_networks.py::test_criterions",
    "test_models/test_networks.py::test_front_generator_no_bg",
    "test_models/test_networks.py::test_generator_full_outputs",
    "test_models/test_networks.py::test_temporal_generator_uses_ttt",
    "test_models/test_real_assets.py::test_uv_merge_and_flows_on_real_topology",
    "test_models/test_smpl.py::test_smplh_pads_hand_pose",
    "test_ops/test_rasterizer_pallas.py::test_binning_covers_all_valid_faces",
    "test_ops/test_rasterizer_pallas.py::test_csr_span_budget_holds_for_body_poses",
    "test_parallel/test_parallel.py::test_sharded_synthesize_matches_single_device",
    "test_parallel/test_parallel.py::test_streaming_synthesizer",
    "test_services/test_end_to_end.py::test_evaluator_metrics",
    "test_services/test_end_to_end.py::test_imitate_produces_frames",
    "test_services/test_end_to_end.py::test_novel_view_service",
    "test_services/test_end_to_end.py::test_personalize_uses_pretrained_when_present",
    "test_services/test_end_to_end.py::test_preprocess_creates_manifest",
    "test_services/test_end_to_end.py::test_swapper_end_to_end",
    "test_services/test_scripts.py::test_accuracy_cost_smoke",
    "test_services/test_scripts.py::test_visual_processed_data_smoke",
    "test_tools/test_autoload_weights.py::test_gca_mattor_autoload",
    "test_tools/test_autoload_weights.py::test_refine_inpaintor_autoload",
    "test_tools/test_deformer_fit.py::test_offsets_fit_recovers_wider_body",
    "test_tools/test_detection.py::test_detect_person_boxes_still_photo_real",
    "test_tools/test_parsers.py::test_parser_targets_and_run",
    "test_tools/test_parsers.py::test_schp_matches_reference_torch",
    "test_tools/test_perception.py::test_gca_matting_refiner_forward",
    "test_tools/test_perception.py::test_mattor_trained_weights_band_combination",
    "test_tools/test_perception.py::test_refine_inpaintor_forward_and_stage2_wiring",
    "test_tools/test_pose2d_decode.py::test_flip_tta_tables_match_target_builder",
    "test_tools/test_pose2d_mobilenet.py::test_coco18_targets_decode_back",
    "test_tools/test_pose2d_mobilenet.py::test_mobilenet_matches_reference_torch",
    "test_tools/test_pose2d_mobilenet.py::test_mobilenet_runner_body25_contract",
    "test_tools/test_synth_data.py::test_compose_scene_labels_consistent",
    "test_tools/test_synth_data.py::test_compose_scene_photo_domain",
    "test_tools/test_synth_data.py::test_make_theta_yaw_distribution",
    "test_trainers/test_aug_bg.py::test_aug_bg_train_step_runs_and_supervises",
    "test_trainers/test_lwg_trainer.py::test_baseline_trainer_registry_step",
    "test_trainers/test_lwg_trainer.py::test_bf16_remat_train_step",
    "test_trainers/test_lwg_trainer.py::test_ckpt_restores_optimizer_state",
    "test_trainers/test_lwg_trainer.py::test_eval_step_metrics",
    "test_trainers/test_lwg_trainer.py::test_nonfinite_batch_does_not_poison_params",
    "test_trainers/test_lwg_trainer.py::test_sharded_train_step_compiles",
    "test_trainers/test_lwg_trainer.py::test_single_device_train_step",
    "test_utils/test_torch_convert_generator.py::test_generator_matches_reference_torch",
    "test_utils/test_torch_convert_perception.py::test_openpose_matches_reference_torch",
    "test_utils/test_torch_convert_perception.py::test_senet50_matches_reference_torch",
    "test_utils/test_torch_convert_perception.py::test_sphereface_matches_reference_torch",
    "test_utils/test_torch_convert_perception.py::test_spin_matches_reference_torch",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: compile-heavy test; excluded by -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("[")[0]
        if rel in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
