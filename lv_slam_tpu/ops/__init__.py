from lv_slam_tpu.ops.voxel_map import VoxelMap, build_voxel_map, lookup_leaves  # noqa: F401
from lv_slam_tpu.ops.ndt import NDTResult, ndt_align, make_gauss_params  # noqa: F401
