from .cameras import (
    Camera,
    read_cam_file,
    write_cam_file,
    stage_intrinsics,
    stage_proj_matrices,
    fuse_proj,
)
from .pfm import read_pfm, write_pfm
from .ply import write_ply, read_ply
from .pairs import read_pair_file, write_pair_file
