"""Configuration for EPOS-TPU.

Three tiers, mirroring the reference precedence (SURVEY.md §5):
  1. Environment variables for paths (reference: epos_lib/config.py:10-16).
  2. CLI flags (reference: tf.app.flags across epos_lib/common.py:56-154 and
     each script) — here a dataclass + auto-generated argparse.
  3. Per-model `params.yml` overlay which wins over CLI
     (reference: epos_lib/common.py:157-177).
"""

import argparse
import dataclasses
import os
from typing import List, Optional

import yaml

# --- Tier 1: environment paths (reference: epos_lib/config.py:10-16) ---------
TF_DATA_PATH = os.environ.get('TF_DATA_PATH', os.path.expanduser('~/epos_data'))
TF_MODELS_PATH = os.environ.get(
    'TF_MODELS_PATH', os.path.expanduser('~/epos_models'))
BOP_PATH = os.environ.get('BOP_PATH', os.path.expanduser('~/bop_datasets'))

# Keys whose YAML value is a comma-separated string of ints
# (reference: epos_lib/common.py:174-175).
_CROP_SIZE_KEYS = ('train_crop_size', 'infer_crop_size', 'eval_crop_size')


@dataclasses.dataclass
class Config:
  """All knobs of the pipeline. Field names match the reference flags."""

  # --- EPOS flags (reference: epos_lib/common.py:60-80) ---
  frag_cls_agnostic: bool = False
  frag_loc_agnostic: bool = False
  num_frags: int = 64
  min_visib_fract: float = 0.1
  corr_min_obj_conf: float = 0.1        # tau_a
  corr_min_frag_rel_conf: float = 0.5   # tau_b
  # [compat] accepted and inert — inert in the REFERENCE too: defined at
  # common.py:78-80 but never read; --project_to_surface is the live flag.
  corr_project_to_model: bool = False

  # --- Model flags (reference: epos_lib/common.py:83-154) ---
  model: Optional[str] = None
  dataset: Optional[str] = None
  model_variant: str = 'xception_65'
  logits_kernel_size: int = 1
  image_pyramid: Optional[List[float]] = None
  add_image_level_feature: bool = True
  # [compat] strided ASPP image pooling (common.py:102-104); the build
  # always uses global pooling (the reference default [1,1]).
  image_pooling_stride: List[int] = dataclasses.field(
      default_factory=lambda: [1, 1])
  aspp_with_batch_norm: bool = True
  aspp_with_separable_conv: bool = True
  multi_grid: Optional[List[int]] = None
  depth_multiplier: float = 1.0
  divisible_by: Optional[int] = None
  atrous_rates: List[int] = dataclasses.field(
      default_factory=lambda: [12, 24, 36])
  decoder_output_stride: List[int] = dataclasses.field(
      default_factory=lambda: [4])
  encoder_output_stride: int = 8
  decoder_use_separable_conv: bool = True
  merge_method: str = 'max'
  # [compat] accepted and inert — inert in the REFERENCE too: stored into
  # ModelOptions (common.py:225,282) but never read anywhere (grep-verified).
  prediction_with_upsampled_logits: bool = True
  use_bounded_activation: bool = False
  # Train losses at GT resolution with upsampled logits (loss.py:129-133;
  # GT maps are then generated at stride 1, train.py:441-446).
  upsample_logits: bool = False

  # --- Training flags (reference: scripts/train.py:29-159) ---
  # Multi-process (multi-host) training — reference flag names
  # (train.py:35-50); see epos_tpu/parallel/distributed.py.
  master: Optional[str] = None      # coordinator host:port (TF1 'master')
  num_replicas: int = 1             # number of processes
  task: int = 0                     # this process's index
  # [compat] TF1 PS/clone scheme knobs with no JAX equivalent: clones are
  # mesh devices, parameter servers don't exist (train.py:29-50).
  num_clones: int = 1
  clone_on_cpu: bool = False
  num_ps_tasks: int = 0
  startup_delay_steps: int = 15
  obj_cls_loss_weight: float = 1.0
  frag_cls_loss_weight: float = 1.0
  frag_loc_loss_weight: float = 100.0
  gt_knn_frags: int = 1
  freeze_regex_list: Optional[List[str]] = None
  learning_policy: str = 'poly'
  base_learning_rate: float = 0.0001
  learning_rate_decay_factor: float = 0.1
  learning_rate_decay_step: int = 2000
  learning_power: float = 0.9
  momentum: float = 0.9
  slow_start_step: int = 0
  slow_start_learning_rate: float = 1e-4
  last_layer_gradient_multiplier: float = 1.0
  last_layers_contain_logits_only: bool = False
  train_steps: int = 2000000
  train_batch_size: int = 1
  train_max_height_before_crop: int = 480
  train_crop_size: List[int] = dataclasses.field(
      default_factory=lambda: [640, 480])
  train_tfrecord_names: Optional[List[str]] = None
  fine_tune_batch_norm: bool = True
  # [extension] BatchNorm moving-average momentum override for the xception
  # family and the ASPP/decoder (None keeps the reference constants:
  # 0.9997 xception/heads per xception_arg_scope net_xception.py:741-751,
  # 0.997 resnet/mobilenet). Short from-scratch trainings need a smaller
  # value: at 0.9997 the moving stats still carry 0.9997^steps of their
  # init (74% after 1k steps), so eval-mode BN lags the trained params.
  bn_momentum: Optional[float] = None
  # [extension] BN moving stats are recalibrated on this many RAW
  # (un-augmented) training batches before every checkpoint save
  # (trainer.recalibrate_batch_stats). 0 disables. Root-caused necessity:
  # stats saved mid-short-schedule are an EMA of the last ~1/(1-momentum)
  # AUGMENTED batches, a measurably different activation distribution than
  # clean eval images — on the tracked benchmark's 20k checkpoint this cost
  # 2.1x fragment top-1 accuracy (0.27 vs 0.57) and collapsed BOP AR
  # (ACCURACY_r05.json). The reference never hits this because its 2M-step
  # schedule converges stats in-run (epos/scripts/train.py:103-105).
  bn_recalibration_batches: int = 100
  weight_decay: float = 0.00004
  initial_checkpoint: Optional[str] = None
  initialize_last_layer: bool = False
  log_steps: int = 10
  save_interval_steps: int = 50000
  max_checkpoints_to_keep: int = 40
  save_summaries_steps: int = 1000
  data_augmentations: Optional[dict] = None
  profile_logdir: Optional[str] = None  # reference: scripts/train.py:66-69

  # --- Inference flags (reference: scripts/infer.py:40-146) ---
  task_type: str = 'localization'
  infer_tfrecord_names: Optional[List[str]] = None
  infer_max_height_before_crop: int = 480
  infer_crop_size: List[int] = dataclasses.field(
      default_factory=lambda: [640, 480])
  checkpoint_name: Optional[str] = None
  project_to_surface: bool = False
  save_estimates: bool = True
  save_corresp: bool = False
  infer_name: Optional[str] = None
  # --cpu_only (reference infer.py:40-41 hides the GPU): force the CPU
  # backend for inference.
  cpu_only: bool = False
  # Pose fitting (reference: scripts/infer.py:72-120). The on-device
  # fitter redesigns Progressive-X (batched hypotheses + greedy
  # multi-instance; ops/ransac.py), so the GC-RANSAC-specific knobs below
  # marked [compat] are accepted for CLI compatibility but have no effect.
  fitting_method: str = 'progressive_x'
  inlier_thresh: float = 4.0              # tau_r [px]
  neighbour_max_dist: float = 20.0        # tau_d: local-sample radius
  min_hypothesis_quality: float = 0.5     # tau_q
  required_progx_confidence: float = 0.5  # [compat]
  required_ransac_confidence: float = 1.0  # [compat]
  min_triangle_area: float = 0.0          # tau_t: degenerate-sample gate
  use_prosac: bool = False
  # PEARL re-optimization runs when 1 < instances <= this cap
  # (pyprogressivex gate; ops/ransac.py pearl_refine).
  max_model_number_for_pearl: int = 5
  # Weight of the neighbour-vote spatial-coherence term in the PEARL
  # assignment step (the Potts energy's smoothness weight).
  spatial_coherence_weight: float = 0.1
  # Final threshold fraction of the annealed local refinement
  # (ops/ransac.py fit_one): the inlier gate tightens tau_r ->
  # anneal*tau_r across refine rounds (GC-RANSAC-style local
  # optimization). 1.0 (no annealing) is the default: on CNN-predicted
  # correspondences, whose inlier noise fills the whole tau_r band,
  # tightening discards real support — measured on the r3c checkpoint
  # (holdout AR 0.306 at anneal 0.5 vs 0.316 at 1.0, both refine_iters 6).
  refine_anneal: float = 1.0
  # Rounds of the iterated-weighted-EPnP local optimization per accepted
  # hypothesis (GC-RANSAC LO role; each round re-estimates inliers then
  # runs 2 Gauss-Newton steps). 6 measured best on CNN predictions
  # (holdout AR 0.299 at 3 rounds -> 0.316 at 6, anneal 1.0).
  refine_iters: int = 6
  # Errors-in-variables depth-debias strength (0 = off, 1 = full analytic
  # correction; ops/ransac.py _depth_debias). Reprojection-LS with noisy
  # predicted 3D points and EXACT 2D pixels systematically inflates depth
  # (apparent 3D spread s^2 grows by 2*sigma^2, so z_hat ~ z*(1+sigma^2/
  # s^2)); measured on the controlled-noise probe: +6.9 mm bias at
  # sigma=2 mm, +38 mm at 5 mm, lateral error 20-40x smaller. The
  # correction estimates sigma from a truncation-robust Rayleigh quantile
  # match of inlier residuals and shrinks t accordingly (probe: bias
  # -> ~0 at sigma<=5 mm). No reference analogue (infer.py's Prog-X
  # carries the same bias). End-to-end A/B on the round-5 tracked 50k
  # checkpoint (64-image holdout): 1.0 scores AR 0.3535 vs 0.3483 off,
  # ADI@0.1d 0.368 vs 0.330, median depth err 20.2 vs 21.7 mm — but the
  # signed depth error overshoots ~+1 -> -7.0 mm (CNN residuals are not
  # iid Rayleigh, so full strength overcorrects). Kept off by default:
  # the AR gain is within split noise and the tracked benchmark's
  # semantics stay comparable across rounds; enable ~0.5-1.0 per-dataset
  # after a holdout sweep.
  depth_debias: float = 0.0
  scaling_from_millimeters: float = 0.1   # [compat]
  max_tanimoto_similarity: float = 0.9    # [compat]
  max_correspondences: Optional[int] = None
  max_instances_to_fit: Optional[int] = None
  max_fitting_iterations: int = 400
  # Absolute acceptance floor (the role of pyprogressivex's absolute
  # min_coverage, reference infer.py:482): minimum summed inlier confidence
  # an instance must reach. Guards DETECTION mode against phantom poses from
  # a handful of spurious tau_a pixels, which the instance-relative tau_q
  # criterion alone would accept (the first instance compares to itself).
  # Calibrated on real CNN output (ACCURACY_r04.json detection sweep,
  # 64-image variable-count split): BOP19 AR is flat across mass 2..16
  # (top-n caps phantoms out of AR) while phantom poses drop 31 -> 8;
  # 8.0 sits at the knee (11.6% phantom rate). Raise toward 16 for
  # precision-critical DETECTION (measured: -0.002 AR, phantom rate 6.6%).
  min_inlier_mass: float = 8.0
  # Visualization.
  vis: bool = False
  vis_gt_poses: bool = True
  vis_pred_poses: bool = True
  vis_gt_obj_labels: bool = True
  vis_pred_obj_labels: bool = True
  vis_pred_obj_confs: bool = False
  vis_gt_frag_fields: bool = False
  vis_pred_frag_fields: bool = False

  # --- Eval flags (reference: scripts/eval.py) ---
  eval_tfrecord_names: Optional[List[str]] = None
  eval_max_height_before_crop: int = 480
  eval_crop_size: List[int] = dataclasses.field(
      default_factory=lambda: [640, 480])

  # --- EPOS-TPU specific (no reference equivalent) ---
  # Fixed capacities replacing the reference's dynamic shapes (SURVEY.md §7).
  max_gt_instances: int = 16          # Padded GT annotations per image.
  max_corrs_per_obj: int = 2048       # Padded correspondences per object.
  # Route the two correspondence-selection top-Ks through
  # lax.approx_max_k (TPU PartialReduce, recall 0.95) instead of the full
  # lax.top_k sort. Measured on-chip A/B (quiet chip, flagship config):
  # extract 12.86 -> 10.90 ms/img (PROFILE_r05.json), and the 90k tracked
  # holdout poses are BIT-IDENTICAL to the exact path (AR 0.3647 both
  # ways) — the survivor pool is small vs capacity, so the 5% recall tail
  # never reaches kept correspondences; where it would, it hits only the
  # lowest-confidence tail that the confidence-weighted RANSAC discounts
  # (unit test pins >=90% kept confidence mass). CPU falls back to the
  # exact sort, so this is a TPU-only behavior change.
  corresp_approx_topk: bool = True
  compute_dtype: str = 'bfloat16'     # MXU-friendly compute precision.
  num_pipeline_workers: int = 1       # Host data workers (1-core host).
  mesh_shape: Optional[List[int]] = None  # Device mesh (None = all-data-parallel).
  # Stop the train loop at this step WITHOUT changing the LR horizon
  # (train_steps): enables chunked runs that restart the process to shed
  # the axon H2D-leak (CLAUDE.md hazard 11) while the schedule stays that
  # of one continuous run.
  stop_at_step: Optional[int] = None
  gt_cache_dir: Optional[str] = None  # Pre-rendered GT field cache.

  @property
  def model_dir(self):
    if self.model is None:
      return None
    return os.path.join(TF_MODELS_PATH, self.model)

  def update_from_yaml(self, params_path):
    """YAML overlay; YAML wins over CLI (epos_lib/common.py:157-177)."""
    if not os.path.exists(params_path):
      return self
    with open(params_path, 'r') as f:
      params = yaml.safe_load(f) or {}
    for name, val in params.items():
      if not hasattr(self, name):
        continue
      if name in _CROP_SIZE_KEYS and isinstance(val, str):
        val = [int(x) for x in val.split(',')]
      setattr(self, name, val)
    return self

  def update_from_model_params(self):
    """Loads <model_dir>/params.yml if it exists (scripts/train.py:428)."""
    if self.model_dir is not None:
      self.update_from_yaml(os.path.join(self.model_dir, 'params.yml'))
    return self

  def replace(self, **kw):
    return dataclasses.replace(self, **kw)


def _add_field_arg(parser, f):
  name = '--' + f.name
  if f.type in (bool, 'bool'):
    parser.add_argument(name, type=lambda s: s.lower() in ('1', 'true', 'yes'),
                        default=None)
  elif f.type in (int, 'int', Optional[int]):
    parser.add_argument(name, type=int, default=None)
  elif f.type in (float, 'float'):
    parser.add_argument(name, type=float, default=None)
  elif 'List[int]' in str(f.type):
    parser.add_argument(name, type=lambda s: [int(x) for x in s.split(',')],
                        default=None)
  elif 'List[float]' in str(f.type):
    parser.add_argument(name, type=lambda s: [float(x) for x in s.split(',')],
                        default=None)
  elif 'List[str]' in str(f.type):
    parser.add_argument(name, type=lambda s: s.split(','), default=None)
  else:
    parser.add_argument(name, type=str, default=None)


def build_parser(description=''):
  """argparse parser exposing every Config field as a flag."""
  parser = argparse.ArgumentParser(description=description)
  for f in dataclasses.fields(Config):
    _add_field_arg(parser, f)
  return parser


def config_from_args(args=None, description=''):
  """Parses CLI args into a Config, then applies the params.yml overlay.

  Matches the reference order: flags parsed first, YAML applied after and
  winning (epos_lib/common.py:157-177).
  """
  # Persistent XLA compilation cache for every CLI entry point: TPU
  # compiles through the tunnel are slow/variable, and chunked training +
  # per-chunk scoring pay one fresh process per chunk. EPOS_JAX_CACHE_DIR
  # overrides the location; set-but-EMPTY disables the cache entirely —
  # the pytest suite needs that because XLA:CPU executable
  # deserialization reproducibly aborts on the big RANSAC while-loop
  # executables (tests/conftest.py), and a TPU job must never share a
  # cache dir with a concurrent CPU reader for the same reason.
  import jax
  cache_dir = os.environ.get('EPOS_JAX_CACHE_DIR')
  if cache_dir is None:
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
  if cache_dir:
    jax.config.update('jax_compilation_cache_dir', cache_dir)
  parser = build_parser(description)
  ns, _ = parser.parse_known_args(args)
  cfg = Config()
  for f in dataclasses.fields(Config):
    v = getattr(ns, f.name, None)
    if v is not None:
      setattr(cfg, f.name, v)
  cfg.update_from_model_params()
  return cfg
