from lv_slam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    ndt_align_sharded,
    ndt_derivatives_sharded,
)
