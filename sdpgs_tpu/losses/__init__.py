from sdpgs_tpu.losses.basic import (  # noqa: F401
    l1_loss,
    l1_loss_mask,
    l2_loss,
    margin_l2_loss,
    normalize_rows,
    patchify,
    patch_norm_mse_loss,
    pearson_corrcoef,
    psnr,
    ssim,
)
from sdpgs_tpu.losses.depth import (  # noqa: F401
    depth_pearson_loss,
    loss_depth_metric,
    loss_depth_smoothness,
    loss_reproject_depth,
    loss_reproject_from_fused,
    reproject_fused_depth,
    reproject_fused_depth_batch,
    segment_pearson_loss,
)
from sdpgs_tpu.losses.feature import (  # noqa: F401
    loss_feature_metric,
    penalty_loss,
    segment_cluster_assign,
)
