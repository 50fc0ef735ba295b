from .crossview import inverse_warping, cross_view_loss
from .supervised import cas_mvsnet_loss, smooth_l1, masked_smooth_l1
from .entropy import info_entropy_loss, entropy_loss, focal_loss_bld
from .unsupervised import unsup_loss, unsup_reconstruction_loss, ssim, depth_smoothness
