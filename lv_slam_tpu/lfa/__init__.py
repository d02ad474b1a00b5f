from lv_slam_tpu.lfa.pipeline import LfaPipeline  # noqa: F401
