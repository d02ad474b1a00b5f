from lv_slam_tpu.core import se3  # noqa: F401
from lv_slam_tpu.core.cloud import PointCloud  # noqa: F401
