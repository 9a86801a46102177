"""Common names used throughout EPOS-TPU.

Mirrors the canonical names of the reference (epos_lib/common.py:14-52) so
artifacts (sample dicts, prediction dicts, saved files) stay interoperable.
"""

# 6D object pose estimation tasks.
LOCALIZATION = 'localization'
DETECTION = 'detection'

# Pose fitting methods.
PROGRESSIVE_X = 'progressive_x'   # On-device multi-instance RANSAC (redesign).
OPENCV_RANSAC = 'opencv_ransac'   # Single-instance host fallback via cv2.

# Predictions.
PRED_OBJ_LABEL = 'pred_obj_label'
PRED_OBJ_CONF = 'pred_obj_conf'
PRED_FRAG_CONF = 'pred_frag_conf'
PRED_FRAG_LOC = 'pred_frag_loc'
PRED_CORRESP = 'pred_corresp'

# Ground-truth maps.
GT_OBJ_LABEL = 'gt_obj_label'
GT_FRAG_LABEL = 'gt_frag_label'
GT_FRAG_LOC = 'gt_frag_loc'
GT_FRAG_WEIGHT = 'gt_frag_weight'

# Lists of ground-truth annotations (padded to a fixed capacity in EPOS-TPU;
# see data/pipeline.py). GT_NUM holds the number of valid entries.
GT_OBJ_IDS = 'gt_obj_ids'
GT_OBJ_VISIB_FRACT = 'gt_obj_visib_fract'
GT_OBJ_MASKS = 'gt_obj_masks'
GT_OBJ_QUATS = 'gt_obj_quats'
GT_OBJ_TRANS = 'gt_obj_trans'
GT_NUM = 'gt_num'

# Other common names.
K = 'K'
IMAGE = 'image'
IMAGE_PATH = 'image_path'
SCENE_ID = 'scene_id'
IM_ID = 'im_id'
TEST_SET = 'test'
PARAMS_FILENAME = 'params.yml'

# Label that is ignored in the object classification loss
# (reference: epos_lib/datagen.py:237).
IGNORE_OBJ_LABEL = 255


def get_outputs_to_num_channels(num_objs, num_frags, frag_cls_agnostic=False,
                                frag_loc_agnostic=False):
  """Head widths, matching epos_lib/common.py:189-203."""
  return {
      PRED_OBJ_CONF: num_objs + 1,
      PRED_FRAG_CONF: (1 if frag_cls_agnostic else num_objs) * num_frags,
      PRED_FRAG_LOC: (1 if frag_loc_agnostic else num_objs) * num_frags * 3,
  }
