from .blocks import (
    Conv2dBlock,
    Conv3dBlock,
    Deconv2dBlock,
    Deconv3dBlock,
    conv_transpose_torch,
)
from .feature import FeatureNet
from .costreg import CostRegNet, Reg2d
from .aggweight import AggWeightNetVolume
from .geofusion import GeoFeatureFusion
from .georeg import GeoRegNet2d
from .fmt import FMT, FMTWithPathway
from .posenc import sine_position_encoding
from .refine import RefineNet
