from .resize import resize_bilinear, resize_nearest, resize_trilinear_depth
from .warp import plane_sweep_warp, bilinear_sample_zeros
from .sampling import uniform_depth_samples, uncertainty_aware_samples
from .regression import depth_regression, prob_volume_stats
from .costvol import build_cost_volume
