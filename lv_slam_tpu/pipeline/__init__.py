from lv_slam_tpu.pipeline.backend import GlobalGraph  # noqa: F401
