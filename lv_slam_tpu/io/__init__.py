from lv_slam_tpu.io import kitti, synthetic  # noqa: F401
