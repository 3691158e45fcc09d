from upliftingtabletennis_tpu.ops.ae_grouping import (
    HeatmapParser,
    match_by_tag,
    nms_heatmaps,
    top_k_candidates,
)
from upliftingtabletennis_tpu.ops.attention import (
    NEG_INF,
    apply_rope_over_time,
    masked_attention,
)
from upliftingtabletennis_tpu.ops.dwconv import depthwise_conv3x3
from upliftingtabletennis_tpu.ops.flash_attention import (
    cross_attention,
    dense_cross_attention,
    flash_cross_attention,
)
from upliftingtabletennis_tpu.ops.heatmap_decode import (
    flip_back,
    flip_test_heatmaps,
    keypoints_from_heatmaps,
)
from upliftingtabletennis_tpu.ops import nms  # submodule (ops.nms.nms = greedy box NMS)
from upliftingtabletennis_tpu.ops.nms import nms_mask, oks_iou, oks_nms, soft_oks_nms
from upliftingtabletennis_tpu.ops.peak import extract_peaks
from upliftingtabletennis_tpu.ops.token_merge import (
    bipartite_soft_matching,
    merge_tokens,
    unmerge_tokens,
)
