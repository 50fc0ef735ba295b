from .runner import DepthRunner, save_scene_depth
from .fusion_dypcd import dypcd_filter, filter_depth_dypcd
from .fusion_pcd import pcd_filter
from .tank_config import TANK_CFG
